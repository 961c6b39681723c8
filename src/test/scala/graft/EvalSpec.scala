package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cf.Eval

/** Hand-computed oracles for the CF evaluation apps
  * (baseline.cpp mean predictors, metric_eval.cpp AP@K).
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("baselineRmse matches hand-computed means and clamps") {
    // u1: {A:2, B:4}, u2: {A:6}  → global mean 4
    val r = Seq((1L, "A", 2.0), (1L, "B", 4.0), (2L, "A", 6.0))
      .toDF("user", "item", "rating")
    val out = Eval.baselineRmse(r, minval = 0.0, maxval = 10.0)
      .as[(String, Double)].collect().toMap
    // global: errs (2-4, 4-4, 6-4) → sqrt((4+0+4)/3)
    assert(math.abs(out("global_mean") - math.sqrt(8.0 / 3)) < 1e-12)
    // user means: u1=3, u2=6 → errs (-1, 1, 0) → sqrt(2/3)
    assert(math.abs(out("user_mean") - math.sqrt(2.0 / 3)) < 1e-12)
    // item means: A=4, B=4 → errs (-2, 0, 2) → sqrt(8/3)
    assert(math.abs(out("item_mean") - math.sqrt(8.0 / 3)) < 1e-12)
  }

  test("baselineRmse clamp truncates predictions like baseline.cpp:89-91") {
    // single user, mean 8 > maxval 5 → prediction clamps to 5
    val r = Seq((1L, "A", 6.0), (1L, "B", 10.0)).toDF("user", "item", "rating")
    val out = Eval.baselineRmse(r, minval = 0.0, maxval = 5.0)
      .as[(String, Double)].collect().toMap
    // errs vs clamped 5: (1, 5) → sqrt(26/2)
    assert(math.abs(out("user_mean") - math.sqrt(13.0)) < 1e-12)
  }

  test("apAtK matches the Hamner/metrics.hpp hand-computed values") {
    // user 1: perfect prefix → AP=1; user 2: hits at ranks 1,3 of an
    // actual list of 2 → (1/1 + 2/3)/2; user 3: no overlap → 0
    val pred = Seq(
      (1L, "a", 1), (1L, "b", 2),
      (2L, "x", 1), (2L, "q", 2), (2L, "y", 3),
      (3L, "m", 1)).toDF("user", "item", "rank")
    val act = Seq(
      (1L, "a", 1), (1L, "b", 2),
      (2L, "y", 1), (2L, "x", 2),
      (3L, "z", 1)).toDF("user", "item", "pos")
    val ap = Eval.apAtK(pred, act, k = 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(ap(1L) - 1.0) < 1e-12)
    assert(math.abs(ap(2L) - (1.0 + 2.0 / 3) / 2) < 1e-12)
    assert(ap(3L) == 0.0)
  }

  test("apAtK truncates the actual list FIRST, then tests membership") {
    // actual list (c, d, e, a) at k=3 truncates to {c, d, e} — a hit on
    // 'a' must NOT count even though 'a' is in the full actual list
    // (metrics.hpp:33-34 sorts only the first min(k,n) entries)
    val pred = Seq((1L, "a", 1), (1L, "c", 2)).toDF("user", "item", "rank")
    val act = Seq((1L, "c", 1), (1L, "d", 2), (1L, "e", 3), (1L, "a", 4))
      .toDF("user", "item", "pos")
    val ap = Eval.apAtK(pred, act, k = 3)
      .as[(Long, Double)].collect().toMap
    // only 'c' hits, at rank 2 with cum_hits 1 → (1/2)/min(3,3)
    assert(math.abs(ap(1L) - (0.5 / 3)) < 1e-12)
  }

  test("apAtK keeps only users present in both inputs, like the index merge") {
    val pred = Seq((1L, "a", 1), (2L, "a", 1)).toDF("user", "item", "rank")
    val act = Seq((1L, "a", 1), (3L, "a", 1)).toDF("user", "item", "pos")
    assert(Eval.apAtK(pred, act, k = 3).select("user")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("apAtK exact-integer path agrees with the double path") {
    // k=31 forces the double fallback; k=30 uses lcm scaling — run the
    // same lists through both k values where they truncate identically
    val pred = (1 to 25).map(i => (1L, s"i$i", i)).toDF("user", "item", "rank")
    val act = (1 to 25).filter(_ % 3 == 0)
      .zipWithIndex.map { case (i, p) => (1L, s"i$i", p + 1) }
      .toDF("user", "item", "pos")
    val exact = Eval.apAtK(pred, act, 30).as[(Long, Double)].collect().head._2
    val dbl = Eval.apAtK(pred, act, 31).as[(Long, Double)].collect().head._2
    assert(math.abs(exact - dbl) < 1e-12)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cf.{Spectral, SvdPlusPlus}
import graft.classify.AdPredictor
import graft.core.Planted

/** SVD (Lanczos), SVD++, AdPredictor — planted-recovery oracles. */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("svd: singular values of the planted block matrix are exact") {
    // disjoint rank-1 blocks: σ_g = sqrt(Σ value²) per block, no linear
    // algebra needed for the expectation (Planted.lowRankMatrix scaladoc)
    val m = Planted.lowRankMatrix(spark, nBlocks = 8, rows = 50, cols = 20)
    val expected = m.select((col("i") / 50).cast("long").as("g"),
        (col("value") * col("value")).as("v2"))
      .groupBy("g").agg(sqrt(sum("v2")).as("sigma"))
      .orderBy(desc("sigma")).as[(Long, Double)].collect().map(_._2)
    val got = Spectral.svdTopK(m, k = 5, nCols = 160)
      .orderBy("rank").as[(Int, Double)].collect()
    assert(got.map(_._1).toSeq == (1 to 5))
    got.map(_._2).zip(expected.take(5)).foreach { case (s, e) =>
      assert(math.abs(s - e) < 1e-6 * e, s"sigma $s vs exact $e")
    }
  }

  test("svd: right singular vectors recover the planted column supports") {
    val m = Planted.lowRankMatrix(spark, nBlocks = 4, rows = 50, cols = 20)
    val (_, v) = Spectral.svdWithV(m, k = 3, nCols = 80)
    // component r's dominant support must be block r's column range
    for (r <- 0 until 3) {
      val comp = (0 until 80).map(j => math.abs(v(j, r)))
      val support = comp.zipWithIndex.filter(_._1 > 1e-8).map(_._2)
      assert(support.nonEmpty &&
        support.forall(j => j / 20 == r),
        s"component $r bleeds outside its planted block: $support")
    }
  }

  test("svd++: planted non-additive block ratings are recovered") {
    val ratings = Fixtures.persist(spark, "planted_ratings",
      Planted.blockRatings(spark))
    val model = SvdPlusPlus.train(ratings, rank = 2, iters = 40,
      lr = 0.2, reg = 0.005)
    val pred = SvdPlusPlus.predict(model, ratings.select("user", "item"),
      ratings)
    val byBlock = pred
      .select((col("user") / 20).cast("long").as("ug"),
        (col("item") / 20).cast("long").as("ig"), col("pred"))
      .groupBy("ug", "ig").agg(avg("pred").as("m"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // block means [[4,2],[2,4]]; additive (bias-only) fit would flatten all
    // four to 3, so a < 0.35 error proves the interaction term is learned
    for (ug <- 0L to 1L; ig <- 0L to 1L) {
      val want = if (ug == ig) 4.0 else 2.0
      val gotM = byBlock((ug, ig))
      assert(math.abs(gotM - want) < 0.35,
        s"block ($ug,$ig): mean pred $gotM vs planted $want")
    }
  }

  test("timeSVD++: antisymmetric temporal drift is recovered per bucket") {
    val ratings = Fixtures.persist(spark, "planted_temporal",
      Planted.temporalRatings(spark))
    val model = graft.cf.TimeSvdPlusPlus.train(ratings, rank = 2, iters = 40,
      lr = 0.2, reg = 0.005)
    val pred = graft.cf.TimeSvdPlusPlus.predict(model,
      ratings.select("user", "item", "t"), ratings)
      .join(ratings, Seq("user", "item", "t"))
    // the drift's mean is zero at every bucket, so ANY t-independent
    // predictor (static SVD++, bias-only, per-(u,i) mean) has MAE >= 1 on
    // this plant; the temporal terms must beat that floor decisively
    val mae = pred.agg(avg(abs(col("pred") - col("rating"))))
      .head().getDouble(0)
    assert(mae < 0.35, f"temporal MAE $mae%.3f (static floor is 1.0)")
    // per-(user-group, bucket) means recover the planted ±1 shift
    val byCell = pred
      .select((col("user") / 20).cast("long").as("ug"),
        (col("item") / 20).cast("long").as("ig"), col("t"), col("pred"))
      .groupBy("ug", "ig", "t").agg(avg("pred").as("m"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    for (ug <- 0L to 1L; ig <- 0L to 1L; t <- 0L to 1L) {
      val drift = if (ug == 0L) 2 * t - 1 else 1 - 2 * t
      val want = (if (ug == ig) 4.0 else 2.0) + drift
      val gotM = byCell((ug, ig, t))
      assert(math.abs(gotM - want) < 0.35,
        s"cell ($ug,$ig,t=$t): mean pred $gotM vs planted $want")
    }
  }

  test("svd++: predict falls back gracefully for unseen users") {
    val ratings = Planted.blockRatings(spark).filter(col("user") < 39)
    val model = SvdPlusPlus.train(ratings, rank = 2, iters = 5)
    val pairs = Seq((39L, 0L), (0L, 0L)).toDF("user", "item")
    val out = SvdPlusPlus.predict(model, pairs, ratings)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!out(39L).isNaN && out.size == 2) // unseen user: μ + b_i only
  }

  test("adpredictor: separable clicks are classified perfectly") {
    val (samples, edges) = Planted.clickDesign(spark)
    val model = AdPredictor.train(samples, edges, sweeps = 3)
    val pred = AdPredictor.predict(model, edges)
    val joined = samples.join(pred, "sample")
      .select("sample", "y", "predict").as[(Long, Int, Int)].collect()
    assert(joined.length == 200)
    joined.foreach { case (s, y, p) => assert(p == y, s"sample $s") }
    // noise features stay at the prior mean up to float-sum residue: the
    // positive/negative contributions mirror exactly, but the distributed
    // sum adds them in partition order, leaving ~1e-16 (class features sit
    // at |mu| ≈ 0.5, twelve orders of magnitude away)
    val noise = model.filter(col("feature") >= 20)
      .as[(Long, Double, Double)].collect()
    noise.foreach { case (f, mu, _) =>
      assert(math.abs(mu) < 1e-12, s"noise feature $f: mu=$mu") }
  }

  test("adpredictor: posterior variance shrinks with evidence") {
    val (samples, edges) = Planted.clickDesign(spark)
    val model = AdPredictor.train(samples, edges, sweeps = 2)
    val s2 = model.as[(Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // every feature was observed; all posteriors must have tightened from
    // the σ²=1 prior and stayed positive
    s2.values.foreach(v => assert(v > 0 && v < 1.0))
  }
}

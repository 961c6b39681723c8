package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cf.{Factorize, ItemCF}

class CfSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // users -> items: u1:{A,B,C} u2:{A,B} u3:{B,C} u4:{A}
  private def inter = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "B"), (3L, "C"),
    (4L, "A")).toDF("user", "item")

  test("itemcf pair metrics match hand-computed values") {
    val sims = ItemCF.pairSimilarities(inter, minIntersection = 1)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // (A,B): common users {1,2}; |A|=3 |B|=3
    val ab = sims(("A", "B"))
    assert(ab._3 == 2 && ab._4 == 3 && ab._5 == 3)
    assert(math.abs(ab._6 - 2.0 / 4.0) < 1e-12) // jaccard
    // AA: 1/log(3) + 1/log(2); RA: 1/3 + 1/2 (udeg(1)=3, udeg(2)=2)
    assert(math.abs(ab._7 - (1 / math.log(3) + 1 / math.log(2))) < 1e-12)
    assert(math.abs(ab._8 - (1.0 / 3 + 1.0 / 2)) < 1e-12)
    assert(math.abs(ab._9 - 2.0 / 3.0) < 1e-12) // cos: 2/sqrt(9)
    // (A,C): common {1}; |A|=3 |C|=2
    val ac = sims(("A", "C"))
    assert(ac._3 == 1 && math.abs(ac._6 - 1.0 / 4.0) < 1e-12)
    // min intersection filter
    val sims2 = ItemCF.pairSimilarities(inter, minIntersection = 2)
    assert(sims2.count() == 2) // (A,B) and (B,C)
  }

  test("itemcf metrics stay internally consistent when the user cap binds") {
    // cap at 2: user 1 (degree 3) is dropped entirely. Remaining
    // interactions: u2:{A,B} u3:{B,C} u4:{A} -> bounded degrees |A|=2 |B|=2
    // |C|=1; (A,B) intersect {u2} -> jaccard = 1/(2+2-1) = 1/3 computed
    // from the SAME bounded table (ADVICE r2: uncapped degrees broke the
    // |I∩|/(|a|+|b|-|I∩|) identity).
    val sims = ItemCF.pairSimilarities(inter, minIntersection = 1,
      maxUserDegree = 2)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val ab = sims(("A", "B"))
    assert(ab._3 == 1 && ab._4 == 2 && ab._5 == 2)
    assert(math.abs(ab._6 - 1.0 / 3.0) < 1e-12) // jaccard over bounded degs
    assert(math.abs(ab._9 - 1.0 / 2.0) < 1e-12) // asym cosine: 1/sqrt(4)
    // identity check on every pair: jaccard == inter/(size_a+size_b-inter)
    sims.values.foreach { s =>
      assert(math.abs(s._6 - s._3.toDouble / (s._4 + s._5 - s._3)) < 1e-12)
    }
  }

  test("itemcf recommend scores unseen items only") {
    val sims = ItemCF.pairSimilarities(inter, minIntersection = 1)
    val recs = ItemCF.recommend(inter, sims, "jaccard", k = 3)
      .as[(Long, String, Double, Int)].collect()
    // user 2 has {A,B}: only C is recommendable
    val u2 = recs.filter(_._1 == 2L)
    assert(u2.map(_._2).toSet == Set("C"))
    // user 4 has {A}: B and C recommendable, B ranks first
    // (sim(A,B)=0.5 > sim(A,C)=0.25)
    val u4 = recs.filter(_._1 == 4L).sortBy(_._4)
    assert(u4.map(_._2).toSeq == Seq("B", "C"))
  }

  test("NMF factors are non-negative and fit a planted non-negative matrix") {
    val r = new scala.util.Random(11)
    val uf = Array.fill(25, 2)(r.nextDouble())
    val itf = Array.fill(15, 2)(r.nextDouble())
    val ratings = (for {
      u <- 0 until 25; i <- 0 until 15
    } yield (u, i, (uf(u)(0) * itf(i)(0) + uf(u)(1) * itf(i)(1)).toFloat))
      .toDF("user", "item", "rating")
    val m = graft.cf.Factorize.nmf(ratings, rank = 2, iters = 15)
    // constraint: every factor component >= 0
    val negU = m.userFactors.select(explode(col("features")).as("f"))
      .filter(col("f") < 0f).count()
    val negI = m.itemFactors.select(explode(col("features")).as("f"))
      .filter(col("f") < 0f).count()
    assert(negU == 0 && negI == 0, "NMF produced negative factor components")
    // fit: training RMSE small on the exactly-rank-2 non-negative matrix
    // (NNLS converges slower than unconstrained ALS; ratings are O(1))
    val err = graft.cf.Factorize.rmse(m, ratings)
    assert(err < 0.1, s"NMF RMSE too high: $err")
  }

  test("ALS factorization recovers a planted low-rank rating matrix") {
    // planted rank-2 factors, deterministic
    val r = new scala.util.Random(7)
    val uf = Array.fill(30, 2)(r.nextDouble())
    val itf = Array.fill(20, 2)(r.nextDouble())
    val ratings = (for {
      u <- 0 until 30; i <- 0 until 20
      if (u * 20 + i) % 3 != 0 // hold out a third
    } yield (u, i, (uf(u)(0) * itf(i)(0) + uf(u)(1) * itf(i)(1)).toFloat))
      .toDF("user", "item", "rating")
    val m = Factorize.als(ratings, rank = 4, iters = 10, regParam = 0.01)
    val e = Factorize.rmse(m, ratings)
    assert(e < 0.05, s"training rmse $e")
    // deterministic with the same seed
    val e2 = Factorize.rmse(
      Factorize.als(ratings, rank = 4, iters = 10, regParam = 0.01), ratings)
    assert(e == e2)
  }

  test("weighted ALS (implicit) ranks planted in-block items above out-block") {
    // two disjoint taste blocks: users 0-9 repeatedly consume items 0-9,
    // users 10-19 consume items 10-19; counts are the implicit signal
    val ratings = (for {
      u <- 0 until 20; i <- 0 until 20
      block = u / 10
      if i / 10 == block && (u + i) % 4 != 0 // hold out a quarter
    } yield (u, i, 1.0f + ((u * 7 + i * 3) % 5))).toDF("user", "item", "rating")
    val m = Factorize.wals(ratings, rank = 4, iters = 10, alpha = 20.0)
    val prefs = Factorize.predict(m,
      (for (u <- 0 until 20; i <- 0 until 20) yield (u, i))
        .toDF("user", "item"))
      .select("user", "item", "prediction")
      .as[(Int, Int, Double)].collect()
    // every user's mean preference for in-block items beats out-of-block —
    // including the held-out in-block pairs (generalization, not
    // memorizing). Strict separation per user; the 0.2 margin is asserted
    // on the population mean, not per user — ALS's float accumulation
    // order shifts the solution by ulps across runs, and one user sitting
    // exactly on a per-user margin made this test flake under co-load.
    val margins = (0 until 20).map { u =>
      val (in, out) = prefs.filter(_._1 == u).partition(p => p._2 / 10 == u / 10)
      val (mi, mo) = (in.map(_._3).sum / in.size, out.map(_._3).sum / out.size)
      assert(mi > mo, s"user $u inverted: in-block $mi vs out-block $mo")
      mi - mo
    }
    assert(margins.sum / margins.size > 0.2,
      s"mean in/out margin too small: ${margins.sum / margins.size}")
    // stable with the same seed — up to float accumulation order: the
    // normal-equation gathers sum doubles across shuffle partitions, so two
    // runs of the identical solve drift by ulps (measured 9e-16 under
    // co-load); exact equality here flaked for the same reason the margin
    // assertion above moved to the population mean
    val again = Factorize.wals(ratings, rank = 4, iters = 10, alpha = 20.0)
    val (r1, r2) = (Factorize.rmse(m, ratings), Factorize.rmse(again, ratings))
    // 1e-12 relative (ADVICE r5 #1): still ~3 orders above the measured
    // 9e-16 accumulation-order drift, but tight enough that genuine
    // nondeterminism cannot hide under the bound
    assert(math.abs(r1 - r2) <= 1e-12 * math.max(r1, r2),
      s"re-run diverged beyond ulp drift: $r1 vs $r2")
  }

  // --- rating.cpp serving: Factorize.recommendTopK ---

  private def tinyModel = {
    // 3 users × 5 items, rank 2, hand-computable dots
    val uf = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 1.0))).toDF("id", "features")
    val vf = Seq((10L, Seq(5.0, 1.0)), (11L, Seq(4.0, 2.0)),
      (12L, Seq(3.0, 3.0)), (13L, Seq(2.0, 4.0)), (14L, Seq(1.0, 5.0)))
      .toDF("id", "features")
    Factorize.Model(uf, vf)
  }

  test("recommendTopK ranks by dot product and excludes rated items") {
    // user 0 dots: 5,4,3,2,1 — item 10 rated, so top-2 = 11 then 12;
    // user 1 dots: 1,2,3,4,5 — nothing rated, top-2 = 14 then 13
    val rated = Seq((0L, 10L)).toDF("user", "item")
    val got = Factorize.recommendTopK(tinyModel, rated, k = 2)
      .orderBy("user", "rank")
      .select("user", "rank", "item", "prediction")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1, 11L, 4.0), (0L, 2, 12L, 3.0),
      (1L, 1, 14L, 5.0), (1L, 2, 13L, 4.0),
      (2L, 1, 10L, 6.0), (2L, 2, 11L, 6.0)))
  }

  test("recommendTopK clamp ties break by ascending item id") {
    // user 2 dots are all 6 — clamped at 5 they stay tied; rating.cpp's
    // Eigen-internal tie order is replaced by deterministic item-ascending
    val rated = spark.emptyDataset[(Long, Long)].toDF("user", "item")
    val got = Factorize.recommendTopK(tinyModel, rated, k = 3,
        minval = 0.0, maxval = 5.0)
      .filter(col("user") === 2).orderBy("rank")
      .select("item", "prediction").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 5.0), (11L, 5.0), (12L, 5.0)))
  }

  test("recommendTopK singular-value weighting matches u'·diag(σ)·v") {
    // svd_predict (rating.cpp:113-131): weights (2, 0.5) re-rank user 0 —
    // dot(u0, diag(2,.5)·v) = 2·v1: 10,8,6,4,2 — order unchanged; user 1
    // = .5·v2: .5,1,1.5,2,2.5 — and user 2 mixes: 10.5,9,7.5,6,4.5
    val rated = spark.emptyDataset[(Long, Long)].toDF("user", "item")
    val got = Factorize.recommendTopK(tinyModel, rated, k = 1,
        singularValues = Some(Seq(2.0, 0.5)))
      .orderBy("user").select("item", "prediction")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 10.0), (14L, 2.5), (10L, 10.5)))
  }

  test("recommendTopK blocked path equals the naive window ranking") {
    // blockSize=2 forces multi-block merges over the planted fixture shape
    val f = graft.core.Planted.cfFactors(spark, nUsers = 12, nItems = 30,
      d = 4)
    def fac(tag: String) = graft.core.Planted.cfFactorsWide(f, tag)
    val model = Factorize.Model(fac("u"), fac("v"))
    val rated = fac("u").select(col("id").as("user"))
      .crossJoin(fac("v").select(col("id").as("item")))
      .filter((col("user") * 3 + col("item")) % 7 === 0)
    val blocked = Factorize.recommendTopK(model, rated, k = 4,
        minval = -3.0, maxval = 3.0, blockSize = 2)
      .select("user", "rank", "item", "prediction")
    val naive = Factorize.predict(model,
        fac("u").select(col("id").as("user"))
          .crossJoin(fac("v").select(col("id").as("item")))
          .filter((col("user") * 3 + col("item")) % 7 =!= 0))
      .select(col("user"), col("item"),
        least(greatest(col("prediction"), lit(-3.0)), lit(3.0))
          .as("prediction"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user")
          .orderBy(col("prediction").desc, col("item"))))
      .filter(col("rank") <= 4)
      .select("user", "rank", "item", "prediction")
    assert(blocked.orderBy("user", "rank").collect().toSeq ==
      naive.orderBy("user", "rank").collect().toSeq)
  }
}

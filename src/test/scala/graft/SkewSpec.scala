package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Skew
import graft.algos.PageRank
import graft.derive.{CodeLakehouse, EdgeDerive}

/** Salting + broadcast-side replication on a genuinely skewed graph (the
  * lakehouse import graph has power-law in-degree by construction).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  lazy val edges = {
    val (e, _) = EdgeDerive.derive(CodeLakehouse.table(spark, 2000L))
    e.cache()
  }

  test("salted two-level sum equals the plain aggregation") {
    val plain = edges.groupBy("dst").agg(sum("weight").as("w"))
      .as[(Long, Double)].collect().toMap
    val salted = Skew.saltedSum(edges.toDF(), "dst", "weight", "w",
      buckets = 16, saltSource = col("src"))
      .as[(Long, Double)].collect().toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-9, s"key $k")
    }
  }

  test("replicated skew join equals the plain join") {
    val dims = edges.select(col("dst")).distinct()
      .withColumn("tag", col("dst") % 7)
    val plain = edges.join(dims, "dst")
      .select("src", "dst", "tag").as[(Long, Long, Long)].collect().sorted
    val skewed = Skew.replicatedSkewJoin(edges.toDF(), dims, "dst",
      buckets = 8, bigSaltSource = col("src"))
      .select("src", "dst", "tag").as[(Long, Long, Long)].collect().sorted
    assert(skewed.sameElements(plain))
  }

  test("pagerank with salted gather converges to the same fixpoint") {
    val a = PageRank.run(spark, edges, tol = 1e-8, maxIters = 60)
      .state.select("id", "rank").as[(Long, Double)].collect().toMap
    val b = PageRank.run(spark, edges, tol = 1e-8, maxIters = 60,
      saltBuckets = 16)
      .state.select("id", "rank").as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    val maxErr = a.map { case (k, v) => math.abs(v - b(k)) }.max
    assert(maxErr < 1e-7, s"salted/unsalted deviate: $maxErr")
  }
}

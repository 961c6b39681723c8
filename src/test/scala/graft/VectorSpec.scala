package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.vectors.Similarity

class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  lazy val emb = Tables(spark, TestSessions.Sf0001, "embeddings").cache()

  private def localTopK(k: Int): Map[Long, Seq[Long]] = {
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.keys.filter(_ < 10).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
    }.toMap
  }

  test("brute-force cosine top-k matches the local oracle exactly") {
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.sortBy(_._3).map(_._2).toSeq
      }
    assert(got == localTopK(5))
  }

  test("IVF top-k: probed-cell invariant, determinism, planted-dup recall") {
    // structural invariant: every returned neighbor lives in one of its
    // query's probed cells (the IVF contract), and results are deterministic
    val got = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
      centEvery = 7, nprobe = 2)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    val again = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
      centEvery = 7, nprobe = 2)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    assert(got.toSet == again.toSet && got.nonEmpty)
    // a near-identical planted duplicate shares its original's cell (L2
    // assignment of a 1.001-scaled copy) and must surface as top-1 —
    // nprobe>=1 always includes the query's own nearest cell
    val planted = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus2 = emb.select("vec_id", "embedding").unionByName(planted)
    val withDup = Similarity.ivfTopK(corpus2,
      emb.filter(col("vec_id") < 10), k = 1, centEvery = 7, nprobe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { q =>
      assert(withDup(q) == q + 1000000L,
        s"query $q: planted duplicate not found (got ${withDup.get(q)})")
    }
  }

  test("LSH top-k: perfect recall on strong neighbors, partial on weak") {
    // strong-similarity regime (what LSH is for): plant a cos≈0.999
    // neighbor for each query; its top-1 must be found via the buckets
    val planted = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionAll(planted)
    val top1 = Similarity.lshTopK(corpus, emb.filter(col("vec_id") < 10), 1)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    assert(top1.length == 10)
    top1.foreach { case (q, v, _) => assert(v == q + 1000000L) }

    // weak-similarity regime (cos ~0.4 natural neighbors): recall is
    // necessarily partial — assert it is at least non-trivial
    val want = localTopK(5)
    val got = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recall = want.toSeq.map { case (q, ids) =>
      ids.count(got.getOrElse(q, Set.empty)).toDouble / ids.size
    }.sum / want.size
    assert(recall >= 0.15, f"weak-neighbor recall@5 = $recall%.2f")
  }

  test("LSH near-dup pairs find every planted duplicate (same direction)") {
    // plant: scaled copies (identical direction → identical SRP bucket)
    val planted = emb.limit(50).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionAll(planted)
    val pairs = Similarity.nearDupPairs(corpus, threshold = 0.999, bits = 12)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = emb.limit(50).select("vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(expected.subsetOf(pairs), s"missed ${expected -- pairs}")
  }
}

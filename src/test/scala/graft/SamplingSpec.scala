package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def lehmer(a: Long, b: Long, sd: Long): Long = {
    val P = 2147483647L
    ((a % P) * 2654435761L + (b % P) * 40503L + sd % P) % P * 48271L % P
  }

  private val star = (1L to 6L).map(l => (0L, l, 1.0))
    .toDF("src", "dst", "weight")

  test("neighborSample: fanout cap, real neighbors only, exact Lehmer rank") {
    val got = Sampling.neighborSample(spark, star, Seq(0L).toDF("id"), Seq(2))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.forall { case (hop, src, dst) =>
      hop == 1 && src == 0 && (1L to 6L).contains(dst) })
    // exact expected set: the two leaves with the smallest hop-1 Lehmer key
    val want = (1L to 6L).sortBy(d => (lehmer(0, d, 43), d)).take(2).toSet
    assert(got.map(_._3) == want)
    // deterministic across runs
    val again = Sampling.neighborSample(spark, star, Seq(0L).toDF("id"), Seq(2))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == again)
  }

  test("neighborSample: hop-2 expands only from the hop-1 sample set") {
    val path = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "weight")
    val out = Sampling.neighborSample(spark, path, Seq(1L).toDF("id"),
      Seq(1, 1)).as[(Long, Long, Long)].collect()
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 1L, 2L)))
    val h2 = out.filter(_._1 == 2L)
    assert(h2.length == 1 && h2.head._2 == 2L &&
      Set(1L, 3L).contains(h2.head._3))
  }

  test("negativeSample matches a plain-Scala replay of the proposal stream") {
    // two components: srcs {0, 2}; valid negatives: 0->{2,3}, 2->{0,1}
    val e = Seq((0L, 1L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val got = Sampling.negativeSample(spark, e, k = 2, oversample = 8)
      .as[(Long, Long, Long)].collect().toSet
    val verts = Seq(0L, 1L, 2L, 3L) // dense index = sorted order
    val und = Set((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L))
    val want = Seq(0L, 2L).flatMap { src =>
      val survivors = (0L until 16L).flatMap { i =>
        val dst = verts((lehmer(src, i, 42) % 4).toInt)
        if (dst == src || und.contains((src, dst))) None else Some((dst, i))
      }
      val dedup = survivors.groupBy(_._1).map { case (d, xs) =>
        (d, xs.map(_._2).min) }.toSeq.sortBy(_._2)
      dedup.take(2).zipWithIndex.map { case ((d, _), r) =>
        (src, d, r.toLong + 1) }
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("negativeSample yields no rows when every vertex is a neighbor") {
    val out = Sampling.negativeSample(spark, star, k = 2, oversample = 8)
    assert(out.isEmpty) // src 0 is adjacent to all of V \ {0}
  }
}

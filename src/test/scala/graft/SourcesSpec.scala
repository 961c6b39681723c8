package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EdgeListReader

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def tmpFile(content: String): String = {
    val p = Files.createTempFile("graft-src", ".txt")
    Files.writeString(p, content)
    p.toString
  }

  test("edge list: comments skipped, self-edges dropped, default weight") {
    val path = tmpFile(
      """# comment
        |% another comment
        |0	1	0.5
        |1	2
        |3 3
        |2 0 2.5
        |""".stripMargin)
    val got = EdgeListReader.edgeList(spark, path)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 1L, 0.5), (1L, 2L, 1.0), (2L, 0L, 2.5)))
  }

  test("adjacency list: src N nbr1..nbrN") {
    val path = tmpFile(
      """1 3 2 3 4
        |5 1 5
        |6 2 7 8
        |""".stripMargin)
    val got = EdgeListReader.adjList(spark, path)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (6L, 7L), (6L, 8L)))
  }

  test("FRAP typed edge list: src dst sT:dT:eT") {
    val path = tmpFile(
      """0	1	2:1:3
        |1	4	1:2:2
        |""".stripMargin)
    val got = EdgeListReader.typedEdgeList(spark, path, "gX")
      .as[(String, Long, Long, Int, Int, Int)].collect().toSet
    assert(got == Set(("gX", 0L, 1L, 2, 1, 3), ("gX", 1L, 4L, 1, 2, 2)))
  }

  test("multi-value edge list: N-value ':' payload -> array column") {
    val path = tmpFile(
      """0	1	0.5:1.5:2.5
        |1	2	3.25
        |2	3
        |4	4	9:9
        |""".stripMargin)
    val got = EdgeListReader.multiValueEdgeList(spark, path)
      .as[(Long, Long, Seq[Double])].collect().toSet
    assert(got == Set(
      (0L, 1L, Seq(0.5, 1.5, 2.5)),
      (1L, 2L, Seq(3.25)),
      (2L, 3L, Seq.empty[Double])))
  }

  test("matrix market: header + dims row skipped, 1-indexed entries") {
    val path = tmpFile(
      """%%MatrixMarket matrix coordinate real general
        |% comment
        |3 3 3
        |1 2 0.5
        |2 3 1.5
        |3 1
        |""".stripMargin)
    val got = EdgeListReader.matrixMarket(spark, path)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.5), (2L, 3L, 1.5), (3L, 1L, 1.0)))
  }

  test("matrix market: directory read drops EVERY file's dims row") {
    // round-1 bug: a global zipWithIndex dropped only the first file's dims
    val dir = Files.createTempDirectory("graft-mm").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.mtx"),
      """%%MatrixMarket matrix coordinate real general
        |3 3 2
        |1 2 0.5
        |2 3 1.5
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(dir, "b.mtx"),
      """%%MatrixMarket matrix coordinate real general
        |9 9 2
        |7 8 2.5
        |8 9 3.5
        |""".stripMargin)
    val got = EdgeListReader.matrixMarket(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // neither (3,3) nor (9,9) dims row leaks in as a bogus edge
    assert(got == Set((1L, 2L, 0.5), (2L, 3L, 1.5),
      (7L, 8L, 2.5), (8L, 9L, 3.5)))
  }

  test("metis: header + comments skipped, u<=v once, empty line = isolated") {
    // 5 vertices; line k (0-based after header) lists vertex k's neighbors.
    // Reference semantics (conversions.hpp:376-440): u starts at 0, raw
    // (1-indexed) neighbor values, edge kept iff u <= v.
    val path = tmpFile(
      """% a comment
        |5 4
        |1 2
        |0 2
        |1 3
        |
        |3
        |""".stripMargin)
    val got = EdgeListReader.metis(spark, path)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    // u=1 drops (1,0); u=2 drops (2,1); u=3 is the empty line (isolated);
    // u=4 drops (4,3)
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)))
  }

  test("metis: weighted fmt flag is rejected like the reference") {
    val path = tmpFile("2 1 1\n2\n1\n")
    intercept[IllegalArgumentException](
      EdgeListReader.metis(spark, path).collect())
  }

  test("PROV-JSON: synthesized docs parse and round-trip via typedEdgeList") {
    import graft.sources.ProvJsonReader
    val docs = ProvJsonReader.synthesize(spark, 2)
    val edges = ProvJsonReader.typedEdges(spark, docs, "prov")
    val rows = edges.as[(String, Long, Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    // 2 docs × (3 used + 2 wasGeneratedBy + 2 wasInformedBy + 1 wasDerived)
    assert(rows.length == 16)
    // vertex types come from the declared vocab; edge types likewise
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 26 && r._5 >= 0 && r._5 <= 26))
    assert(rows.forall(r => r._6 >= 0 && r._6 <= 38))
    // shared_act is one vertex across lines: the informed target of f*_0 in
    // both docs maps to the same id
    val informedTargets = rows.filter(_._6 == 8).map(_._3).toSet // clone edges
    assert(informedTargets.size < 4) // 4 clone edges, <4 distinct dsts
    // round-trip: write the 3-token text format, read back, compare exactly
    val out = Files.createTempDirectory("graft-prov").toString + "/edges"
    edges.select(col("src"), col("dst"),
      concat_ws(":", col("src_type"), col("dst_type"), col("edge_type"))
        .as("t"))
      .select(concat_ws("\t", col("src"), col("dst"), col("t")).as("value"))
      .coalesce(1).write.text(out)
    val back = EdgeListReader.typedEdgeList(spark, out, "prov")
      .as[(String, Long, Long, Int, Int, Int)].collect().toSet
    assert(back == rows.toSet)
  }
}

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
}

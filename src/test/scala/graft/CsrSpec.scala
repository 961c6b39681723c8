package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.LinkGraph
import graft.plans.CsrPageRank

class CsrSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("CSR PageRank equals the DataFrame PageRank fixpoint (1e-6)") {
    val edges = LinkGraph.edges(spark, TestSessions.Sf0001).cache()
    val csr = CsrPageRank.run(spark, edges, tol = 1e-8, maxIters = 100)
    assert(csr.converged)
    val a = csr.ranks.collect().toMap
    val b = graft.algos.PageRank.run(spark, edges, tol = 1e-8, maxIters = 100)
      .state.select("id", "rank").as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    val maxErr = a.map { case (k, v) => math.abs(v - b(k)) }.max
    assert(maxErr < 1e-6, s"CSR vs DataFrame deviate: $maxErr")
  }

  test("CSR blocks cover every edge exactly once") {
    val edges = LinkGraph.edges(spark, TestSessions.Sf0001)
    val blocks = CsrPageRank.buildBlocks(edges, 4).collect()
    val total = blocks.map(_.dsts.length.toLong).sum
    assert(total == edges.count())
    blocks.foreach { b =>
      assert(b.offsets.head == 0 && b.offsets.last == b.dsts.length)
      assert(b.srcIds.sorted.sameElements(b.srcIds))
    }
  }
}

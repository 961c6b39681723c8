package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.LinkGraph
import graft.algos.PageRank
import graft.engine.{DurableStore, Superstep}

/** Superstep driver: durable checkpointing, manifest metrics, resume. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("durable store checkpoints every superstep and records metrics") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val edges = LinkGraph.edges(spark, TestSessions.Sf0001)
    val store = new DurableStore(spark, dir)
    val res = PageRank.run(spark, edges, tol = -1.0, maxIters = 3, store = store)
    assert(res.supersteps == 3)
    assert(Files.exists(java.nio.file.Path.of(dir, "state/iter=3/_SUCCESS")))
    assert(Files.exists(java.nio.file.Path.of(dir, "manifest.jsonl")))
    val manifest = Files.readAllLines(
      java.nio.file.Path.of(dir, "manifest.jsonl"))
    assert(manifest.size == 3)
    assert(res.metrics.forall(m => m.rows > 0 && m.bytes > 0))
    assert(res.metrics.forall(_.partitions.nonEmpty))
  }

  test("resume from manifest continues mid-run and reaches the same fixpoint") {
    val dir = Files.createTempDirectory("graft-resume").toString
    val edges = LinkGraph.edges(spark, TestSessions.Sf0001)

    // phase 1: run 4 supersteps then "crash"
    PageRank.run(spark, edges, tol = -1.0, maxIters = 4,
      store = new DurableStore(spark, dir))

    // phase 2: resume with a fresh store over the same dir; convergence run
    val store2 = new DurableStore(spark, dir)
    assert(store2.resumePoint().map(_._1).contains(4))
    val resumed = PageRank.run(spark, edges, tol = 1e-6, maxIters = 200,
      store = store2)
    // resumed metrics start at superstep 5 — earlier work was not redone
    assert(resumed.metrics.head.iter == 5)

    val uninterrupted = PageRank.run(spark, edges, tol = 1e-6, maxIters = 200)
    val a = resumed.state.select("id", "rank").as[(Long, Double)].collect().toMap
    val b = uninterrupted.state.select("id", "rank").as[(Long, Double)].collect().toMap
    // the two runs may stop one superstep apart at the tol margin, so allow
    // up to ~tol deviation between their converged states
    val maxErr = a.map { case (k, v) => math.abs(v - b(k)) }.max
    assert(maxErr < 2e-6, s"resume fixpoint deviates: $maxErr")
  }

  test("delta-iteration frontier shrinks for connected components") {
    val edges = LinkGraph.edges(spark, TestSessions.Sf0001)
    val res = graft.algos.ConnectedComponents.run(spark, edges)
    val actives = res.metrics.map(_.active)
    assert(actives.last == 0, "must converge to an empty frontier")
    // frontier collapses: the final round has far fewer active vertices
    // than the peak (delta iteration actually prunes work)
    assert(actives.max > actives.dropRight(1).last)
  }
}

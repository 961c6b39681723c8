package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.LinkGraph
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}

/** End-to-end correctness of the four core algorithms on the sf0.001-derived
  * link graph, against independent plain-Scala oracles (SURVEY.md §5).
  */
class AlgoSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  lazy val edgesDf = LinkGraph.edges(spark, TestSessions.Sf0001).cache()
  lazy val edgePairs: Seq[(Long, Long)] =
    edgesDf.select("src", "dst").as[(Long, Long)].collect().toSeq

  test("link graph derivation: disjoint id spaces, no self-edges, dedup") {
    assert(edgePairs.nonEmpty)
    assert(edgePairs.forall { case (s, d) => s != d })
    assert(edgePairs.distinct.size == edgePairs.size)
  }

  test("pagerank converges to the oracle fixpoint (allclose 1e-6)") {
    val res = PageRank.run(spark, edgesDf, tol = 1e-6, maxIters = 200)
    assert(res.converged, s"did not converge in ${res.supersteps} supersteps")
    val got = res.state.select("id", "rank").as[(Long, Double)].collect().toMap
    // oracle iterated an order of magnitude tighter so its fixpoint error
    // is negligible vs the 1e-6 comparison tolerance
    val want = GraphOracles.pageRank(edgePairs, tol = 1e-9, maxIters = 500)
    assert(got.keySet == want.keySet)
    val maxErr = got.map { case (v, r) => math.abs(r - want(v)) }.max
    assert(maxErr <= 2e-6, s"max |Δ| = $maxErr")
  }

  test("personalized pagerank matches the local seed-teleport recurrence") {
    val seeds = Seq(LinkGraph.CUST + 1L, LinkGraph.CUST + 2L, LinkGraph.CUST + 3L)
    val iters = 6
    val got = PageRank.personalizedFixed(spark, edgesDf, seeds, iters)
      .as[(Long, Double)].collect().toMap
    // local oracle: identical recurrence iterated on the driver
    val verts = edgePairs.flatMap(e => Seq(e._1, e._2)).distinct
    val outDeg = edgePairs.groupBy(_._1).map { case (s, es) => s -> es.size }
    val seedSet = seeds.toSet
    val sm = 1.0 / seeds.size
    var rank = verts.map(v => v -> (if (seedSet(v)) sm else 0.0)).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edgePairs.foreach { case (s, d) =>
        in(d) += rank(s) / outDeg(s)
      }
      rank = verts.map { v =>
        v -> (0.15 * (if (seedSet(v)) sm else 0.0) + 0.85 * in(v))
      }.toMap
    }
    assert(got.keySet == rank.keySet)
    val maxErr = got.map { case (v, r) => math.abs(r - rank(v)) }.max
    assert(maxErr <= 1e-12, s"max |Δ| = $maxErr")
    // teleport returns only to seeds: total mass never exceeds 1, and a
    // vertex unreachable from the seed set holds exactly zero rank
    assert(got.values.sum <= 1.0 + 1e-9)
    val reach = scala.collection.mutable.Set(seeds: _*)
    val adj = edgePairs.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var frontier = seeds.toSet
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).diff(reach.toSet)
      reach ++= frontier
    }
    val unreachable = got.keySet.diff(reach.toSet)
    assert(unreachable.nonEmpty, "test graph should have unreachable vertices")
    assert(unreachable.forall(v => got(v) == 0.0))
  }

  test("HITS matches the local normalized recurrence") {
    val iters = 5
    val got = graft.algos.Hits.run(spark, edgesDf, iters)
      .select("id", "hub", "auth").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val verts = edgePairs.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = verts.map(_ -> 1.0).toMap
    var auth = verts.map(_ -> 1.0).toMap
    def norm(m: Map[Long, Double]) = {
      val n = math.sqrt(m.values.map(x => x * x).sum)
      m.map { case (k, v) => k -> v / n }
    }
    for (_ <- 1 to iters) {
      val a = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edgePairs.foreach { case (s, d) => a(d) += hub(s) }
      auth = norm(verts.map(v => v -> a(v)).toMap)
      val h = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edgePairs.foreach { case (s, d) => h(s) += auth(d) }
      hub = norm(verts.map(v => v -> h(v)).toMap)
    }
    assert(got.keySet == hub.keySet)
    val maxErr = got.map { case (v, (hh, aa)) =>
      math.max(math.abs(hh - hub(v)), math.abs(aa - auth(v)))
    }.max
    assert(maxErr <= 1e-9, s"max |Δ| = $maxErr")
    // unit L2 on both vectors
    assert(math.abs(got.values.map(_._1).map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("pagerank: dangling vertices keep teleport-only rank floor") {
    // region vertices have no out-edges; their rank must still accumulate
    // in-contributions (no redistribution of dangling mass).
    val res = PageRank.run(spark, edgesDf, tol = 1e-6, maxIters = 200)
    val ranks = res.state.select("id", "rank").as[(Long, Double)].collect().toMap
    val regionIds = ranks.keySet.filter(_ < LinkGraph.NATION)
    assert(regionIds.nonEmpty && regionIds.forall(ranks(_) > 0.15))
  }

  test("connected components match union-find oracle exactly") {
    val got = ConnectedComponents.components(spark, edgesDf)
      .as[(Long, Long)].collect().toMap
    val want = GraphOracles.connectedComponents(edgePairs)
    assert(got == want)
  }

  test("label propagation (5 sync rounds) matches oracle exactly") {
    val got = LabelPropagation.run(spark, edgesDf, iters = 5)
      .state.select("id", "label").as[(Long, Long)].collect().toMap
    val want = GraphOracles.labelPropagation(edgePairs, iters = 5)
    assert(got == want)
  }

  test("triangle count total + per-vertex match brute-force oracle") {
    val (wantTotal, wantPer) = GraphOracles.triangles(edgePairs)
    val gotTotal = TriangleCount.total(spark, edgesDf)
      .as[Long].collect().head
    assert(gotTotal == wantTotal)
    val gotPer = TriangleCount.perVertex(spark, edgesDf)
      .as[(Long, Long)].collect().toMap
    assert(gotPer == wantPer)
  }

  test("triangle count is invariant under id permutation") {
    // deterministic bijective permutation (order-reversing)
    val permuted = edgesDf.select(
      (lit(99999999L) - col("src")).as("src"),
      (lit(99999999L) - col("dst")).as("dst"),
      col("weight"))
    val (wantTotal, _) = GraphOracles.triangles(edgePairs)
    val gotTotal = TriangleCount.total(spark, permuted).as[Long].collect().head
    assert(gotTotal == wantTotal)
  }

  test("clustering coefficient: hand case + integer q6 rounding") {
    // K3 (a,b,c) with a pendant d attached to a: lcc(a) = 1/3 (one edge
    // among three neighbors' three possible), lcc(b) = lcc(c) = 1,
    // lcc(d) = 0 (degree < 2); q6 of 1/3 floors to 333333
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val got = TriangleCount.clusteringCoefficient(spark, g)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((3L, 1L, 333333L)), 1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)), 3L -> ((1L, 0L, 0L))))
  }

  test("component sizes report is ordered by size desc") {
    val sizes = ConnectedComponents.componentSizes(
      ConnectedComponents.components(spark, edgesDf))
      .as[(Long, Long)].collect()
    assert(sizes.map(_._2).toSeq == sizes.map(_._2).sortBy(-_).toSeq)
    assert(sizes.map(_._2).sum == edgePairs.flatMap(e => Seq(e._1, e._2)).distinct.size)
  }
}

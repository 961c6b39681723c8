package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-prediction scores for candidate (non-)edges of the undirected
  * simple graph: common-neighbors, Jaccard, resource-allocation (Zhou,
  * Lü & Zhang 2009) and Adamic–Adar. The reference engine's graph
  * toolkits stop at structural analytics; link prediction is the natural
  * next query a link-graph user runs on the same adjacency (and the item
  * side already exists: graft.cf.ItemCF computes the identical score
  * family over the bipartite rating graph, cf.
  * /root/reference/toolkits/collaborative_filtering/itemcf.cpp:31-45).
  *
  * Candidate generation is wedge enumeration at the common neighbor
  * ("apex") z: every unordered pair {u, v} of z's neighbors is a
  * candidate, found by one self-equi-join of the adjacency on z — never
  * all-pairs. A hub apex of degree d contributes C(d, 2) pairs, so hubs
  * are excluded by `maxApexDegree`: scores are computed over common
  * neighbors of degree ≤ the cap. That thresholded semantics is the
  * standard scale mitigation and aligns with what RA/AA measure — a
  * shared hub certifies almost nothing (its weight is 1/d or 1/ln d),
  * so the dropped terms are exactly the least informative ones; each
  * dropped apex changes a pair's RA score by < 1e6/cap in q6. Candidate
  * count is bounded by |apexes| · C(cap, 2) and each survives only with
  * `cn ≥ minCn` support.
  *
  * All scores are exact integers, bit-identical across engines and
  * partitionings:
  *   - `cn`          = |Γ(u) ∩ Γ(v)| over capped apexes (plain count)
  *   - `jaccard_q6`  = round_half_up(1e6 · cn / (deg u + deg v − cn)),
  *                     computed as one 64-bit integer division (degrees
  *                     are the full uncapped degrees)
  *   - `ra_q6`       = Σ_z 1e6 DIV deg(z) — integer division per apex,
  *                     order-free integer sum
  *   - `aa_q6`       = Σ_z 1e12 DIV round_q6(ln deg(z)) — ln is the one
  *                     float op, applied to a handful of DISTINCT integer
  *                     degrees and quantized per-apex BEFORE the sum, so
  *                     the sum stays order-free; a boundary flip would
  *                     need ln(d)·1e6 within ~2e-9 of a half-integer (a
  *                     1–2 ulp engine disagreement at this magnitude)
  *                     while the TRUE minimum margin over every degree
  *                     d ≤ 2·10⁶ is 3.6e-7 — 100× clearance, asserted
  *                     exhaustively in MoreAlgosSpec.
  * deg(z) ≥ 2 for any wedge apex (it has two distinct neighbors), so
  * ln > 0 and neither division can hit zero.
  *
  * Returned pairs are NON-edges only (the prediction target); an
  * existing edge {u,v} is anti-joined away. Columns:
  * (u, v, cn, jaccard_q6, ra_q6, aa_q6) with u < v.
  */
object LinkPrediction {

  def scores(edges: DataFrame, maxApexDegree: Long = Long.MaxValue,
      minCn: Long = 1L): DataFrame = {
    val und = TriangleCount.canonicalEdges(edges)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nbr = und.select(col("u").as("id"), col("v").as("nb"))
      .unionAll(und.select(col("v").as("id"), col("u").as("nb")))
    val deg = nbr.groupBy("id").agg(count(lit(1)).as("deg"))
    // apex rows (z, x, dz): x ∈ Γ(z), capped on z's degree
    val apex = nbr.select(col("id").as("z"), col("nb").as("x"))
      .join(deg.filter(col("deg") <= maxApexDegree)
        .select(col("id").as("z"), col("deg").as("dz")), Seq("z"))
    val wedges = apex.select(col("z"), col("x").as("u"), col("dz"))
      .join(apex.select(col("z"), col("x").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy(col("u"), col("v")).agg(
      count(lit(1)).as("cn"),
      sum(expr("1000000 DIV dz")).as("ra_q6"),
      sum(expr("1000000000000 DIV " +
        "CAST(FLOOR(LN(dz) * 1000000 + 0.5) AS BIGINT)")).as("aa_q6"))
    val nonEdge = scored
      .join(und, Seq("u", "v"), "left_anti")
      .filter(col("cn") >= minCn)
    nonEdge
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("cn"),
        expr("(2 * cn * 1000000 + (du + dv - cn)) DIV (2 * (du + dv - cn))")
          .as("jaccard_q6"),
        col("ra_q6"), col("aa_q6"))
  }

  /** DuckDB oracle: the identical wedge/cap/quantization pipeline. */
  def oracleSql(edgesSql: String, maxApexDegree: Long, minCn: Long,
      topK: Int): String =
    s"""WITH edges AS (
       |$edgesSql
       |),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
       |  FROM edges WHERE src <> dst),
       |nbr AS MATERIALIZED (
       |  SELECT u AS id, v AS nb FROM und
       |  UNION ALL SELECT v, u FROM und),
       |deg AS MATERIALIZED (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM nbr GROUP BY id),
       |apex AS MATERIALIZED (
       |  SELECT n.id AS z, n.nb AS x, d.deg AS dz
       |  FROM nbr n JOIN deg d ON d.id = n.id
       |  WHERE d.deg <= $maxApexDegree),
       |w AS MATERIALIZED (
       |  SELECT l.x AS u, r.x AS v, l.dz
       |  FROM apex l JOIN apex r ON r.z = l.z AND l.x < r.x),
       |sc AS MATERIALIZED (
       |  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
       |    CAST(SUM(1000000 // dz) AS BIGINT) AS ra_q6,
       |    CAST(SUM(1000000000000 //
       |      CAST(FLOOR(LN(dz) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS aa_q6
       |  FROM w GROUP BY u, v),
       |ne AS (
       |  SELECT sc.* FROM sc
       |  LEFT JOIN und e ON e.u = sc.u AND e.v = sc.v
       |  WHERE e.u IS NULL AND sc.cn >= $minCn)
       |SELECT ne.u, ne.v, ne.cn,
       |  CAST((2 * ne.cn * 1000000 + (du.deg + dv.deg - ne.cn))
       |    // (2 * (du.deg + dv.deg - ne.cn)) AS BIGINT) AS jaccard_q6,
       |  ne.ra_q6, ne.aa_q6
       |FROM ne JOIN deg du ON du.id = ne.u JOIN deg dv ON dv.id = ne.v
       |ORDER BY ne.ra_q6 DESC, ne.u, ne.v LIMIT $topK""".stripMargin
}

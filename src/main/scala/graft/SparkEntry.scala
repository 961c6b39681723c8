package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{LinkGraph, Tables}
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears here as a named
  * query over the sf-dir parquet tables, paired (where ANSI-SQL can express
  * it) with a DuckDB oracle in [[oracleSql]]. Graph queries run over the
  * canonical derived link graph ([[graft.core.LinkGraph]]) so the oracle can
  * derive the identical edge table in SQL.
  */
object SparkEntry {

  private val E = LinkGraph.edgesSql
  /** Fixed iteration counts for the oracle-checkable unrolled variants. */
  val PrIters  = 20
  val CcIters  = 20 // must exceed the undirected graph diameter (tested)
  val LpaIters = 5

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Top-20 PageRank vertices of the derived link graph" — the exact query
    * /root/reference/example_apps/pagerank.cpp:180-184 answers.
    */
  def entry(spark: SparkSession): DataFrame = {
    val edges = LinkGraph.edges(spark, "/root/testdata/sf0.001")
    PageRank.run(spark, edges, tol = 1e-6, maxIters = 100)
      .state.select(col("id"), col("rank"))
      .orderBy(desc("rank"), asc("id")).limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / aggregations over the raw tables -------------------------
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "topk_orders" -> ((s, dir) => {
      // top-k sink — reference get_top_vertices (toplist.hpp:71-159)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    }),

    // ---- link-graph derivation + degrees ----------------------------------
    "graph_edges" -> ((s, dir) =>
      LinkGraph.edges(s, dir).orderBy(col("src"), col("dst"))),
    "graph_degrees" -> ((s, dir) =>
      LinkGraph.degrees(LinkGraph.edges(s, dir)).orderBy(col("id"))),

    // ---- PageRank ----------------------------------------------------------
    "pagerank_iters" -> ((s, dir) => {
      // rank quantized to 1e-5 via floor(x*1e5+0.5): identical IEEE double
      // ops in Spark and DuckDB (decimal-rounding semantics differ between
      // the engines on half-boundary values).
      PageRank.fixedIterations(s, LinkGraph.edges(s, dir), PrIters)
        .select(col("id"),
          floor(col("rank") * 1e5 + 0.5).cast("long").as("rank_q5"))
        .orderBy(col("id"))
    }),
    "pagerank_converged" -> ((s, dir) => {
      // to 1e-6 convergence (rows-only driver check; allclose vs the
      // plain-Scala oracle is asserted in PageRankSpec)
      PageRank.run(s, LinkGraph.edges(s, dir), tol = 1e-6, maxIters = 200)
        .state.select(col("id"), col("rank")).orderBy(col("id"))
    }),
    "pagerank_top20" -> ((s, dir) => {
      PageRank.fixedIterations(s, LinkGraph.edges(s, dir), PrIters)
        .select(col("id"),
          floor(col("rank") * 1e5 + 0.5).cast("long").as("rank_q5"))
        .orderBy(desc("rank_q5"), asc("id")).limit(20)
    }),

    // ---- connected components ---------------------------------------------
    "connected_components" -> ((s, dir) => {
      ConnectedComponents.components(s, LinkGraph.edges(s, dir))
        .orderBy(col("id"))
    }),
    "component_sizes" -> ((s, dir) => {
      ConnectedComponents.componentSizes(
        ConnectedComponents.components(s, LinkGraph.edges(s, dir)))
    }),

    // ---- label propagation -------------------------------------------------
    "label_propagation" -> ((s, dir) => {
      LabelPropagation.run(s, LinkGraph.edges(s, dir), iters = LpaIters)
        .state.select(col("id"), col("label")).orderBy(col("id"))
    }),

    // ---- triangles ----------------------------------------------------------
    "triangle_total" -> ((s, dir) =>
      TriangleCount.total(s, LinkGraph.edges(s, dir))),
    "triangle_per_vertex" -> ((s, dir) =>
      TriangleCount.perVertex(s, LinkGraph.edges(s, dir)).orderBy(col("id")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       SUM(l_extendedprice) AS sum_price,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "graph_edges" ->
      s"WITH edges AS (\n$E\n) SELECT src, dst, weight FROM edges ORDER BY src, dst",
    "graph_degrees" ->
      s"""WITH edges AS (
         |$E
         |)
         |SELECT id, CAST(SUM(o) AS BIGINT) AS out_deg,
         |       CAST(SUM(i) AS BIGINT) AS in_deg,
         |       CAST(SUM(o) + SUM(i) AS BIGINT) AS deg
         |FROM (
         |  SELECT src AS id, 1 AS o, 0 AS i FROM edges
         |  UNION ALL SELECT dst, 0, 1 FROM edges)
         |GROUP BY id ORDER BY id""".stripMargin,
    "pagerank_iters" -> PageRank.oracleSql(E, PrIters, 5),
    "pagerank_top20" ->
      // reuse the unrolled CTE chain, change the final projection to top-20
      PageRank.oracleSql(E, PrIters, 5).replace(
        s"FROM r$PrIters ORDER BY id",
        s"FROM r$PrIters ORDER BY 2 DESC, id LIMIT 20"),
    "connected_components" -> ConnectedComponents.oracleSql(E, CcIters),
    "component_sizes" -> {
      val cc = ConnectedComponents.oracleSql(E, CcIters)
      s"""WITH cc AS (
         |${cc.linesIterator.map("  " + _).mkString("\n")}
         |)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS cnt FROM cc
         |GROUP BY label ORDER BY cnt DESC, label""".stripMargin
    },
    "label_propagation" -> LabelPropagation.oracleSql(E, LpaIters),
    "triangle_total" -> TriangleCount.totalOracleSql(E),
    "triangle_per_vertex" -> TriangleCount.perVertexOracleSql(E)
  )
}

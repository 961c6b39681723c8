package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.LinkGraph

/** Triangle counting over the undirected graph via degree-ordered adjacency
  * self-join, the Spark-native equivalent of the reference's pivot-interval
  * merge-intersection (/root/reference/example_apps/trianglecounting.cpp:
  * 126-492) with its degree-order relabeling
  * (preprocessing/util/orderbydegree.hpp:58-150, rationale
  * trianglecounting.cpp:38-41).
  *
  * Each undirected edge {u, v} is oriented from the lower-ranked endpoint to
  * the higher-ranked one, where rank = (degree, id) ascending. Wedges are
  * enumerated only at the *low-degree* apex (`e1 ⋈ e2 on e1.a = e2.a`), so a
  * hot vertex with degree d stores/joins only its higher-ranked neighbors —
  * the classic bound of Σ min(deg) work instead of Σ deg², which is what
  * makes the self-join survive power-law skew at scale. The closing-edge
  * probe is an equi-join against the oriented edge set.
  *
  * Total triangle count is exact; `perVertex` counts each triangle at all
  * three corners (reference semantics: per-vertex counts, total = Σ/3,
  * trianglecounting.cpp:476-485).
  */
object TriangleCount {

  /** Canonical undirected edge set {u < v}, deduplicated. */
  def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Edges oriented by ascending (degree, id) rank: (a → b) with a ranked
    * below b. Returned columns: a, b (original vertex ids).
    */
  def orientByDegree(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("a"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("b"))
  }

  /** All triangles as (x, y, z) corner triples (each triangle once;
    * x = apex in orientation order).
    */
  def triangles(spark: SparkSession, edges: DataFrame): DataFrame = {
    val oriented = orientByDegree(canonicalEdges(edges))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = oriented.select(col("a"), col("b").as("n1"))
    val e2 = oriented.select(col("a"), col("b").as("n2"))
    // wedges at the low-rank apex; n1 != n2, canonicalize the pair with u<v
    // so the closing probe hits the {u<v} edge set exactly once.
    val wedges = e1.join(e2, "a")
      .filter(col("n1") < col("n2"))
      .select(col("a").as("x"),
        col("n1").as("y"), col("n2").as("z"))
    val closing = canonicalEdges(edges)
      .select(col("u").as("y"), col("v").as("z"))
    wedges.join(closing, Seq("y", "z"))
  }

  /** Global triangle count (single row: `triangles: Long`). */
  def total(spark: SparkSession, edges: DataFrame): DataFrame =
    triangles(spark, edges).agg(count(lit(1)).as("triangles"))

  /** Per-vertex triangle counts (id, tri_cnt) — only vertices in >=1
    * triangle appear; each triangle counted at all 3 corners.
    */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    val t = triangles(spark, edges)
    t.select(col("x").as("id"))
      .unionAll(t.select(col("y").as("id")))
      .unionAll(t.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("tri_cnt"))
  }

  /** SQL oracle for the global count: canonical u<v edges, triple join. */
  def totalOracleSql(edgesSql: String): String =
    s"""WITH edges AS (
       |$edgesSql
       |),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
       |  FROM edges WHERE src <> dst)
       |SELECT CAST(COUNT(*) AS BIGINT) AS triangles
       |FROM und e1
       |JOIN und e2 ON e2.u = e1.v
       |JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin

  /** SQL oracle for per-vertex counts. */
  def perVertexOracleSql(edgesSql: String): String =
    s"""WITH edges AS (
       |$edgesSql
       |),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
       |  FROM edges WHERE src <> dst),
       |tris AS MATERIALIZED (
       |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
       |  FROM und e1
       |  JOIN und e2 ON e2.u = e1.v
       |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
       |SELECT id, CAST(COUNT(*) AS BIGINT) AS tri_cnt FROM (
       |  SELECT x AS id FROM tris
       |  UNION ALL SELECT y FROM tris
       |  UNION ALL SELECT z FROM tris)
       |GROUP BY id ORDER BY id""".stripMargin
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical link graph used by every graph query in [[graft.SparkEntry]].
  *
  * The reference engine consumes a plain `(src, dst, weight)` edge list
  * (cf. /root/reference/src/preprocessing/conversions.hpp:212-288); here the
  * edge table is *derived* from the relational testdata tables so the DuckDB
  * oracle can reproduce it with plain SQL on the same parquet files. Entity
  * id spaces are made disjoint with additive bases, so self-edges are
  * impossible by construction (the reference drops self-edges at ingest,
  * conversions.hpp:261).
  *
  * Edge sets (all weights double):
  *   nation   -> region    (w=1)
  *   customer -> nation    (w=1)
  *   supplier -> nation    (w=1)
  *   customer -> order     (w=1)
  *   order    -> part      (w=#lineitems for the pair)
  *   order    -> supplier  (w=#lineitems)
  *   part     -> supplier  (w=#lineitems)
  *
  * Suppliers are few and referenced by every lineitem, so they are the
  * deliberately skewed high-degree vertices (the salting test bed).
  */
object LinkGraph {
  val REGION  = 0L
  val NATION  = 10000000L
  val CUST    = 20000000L
  val SUPP    = 30000000L
  val ORDER   = 40000000L
  val PART    = 50000000L

  /** Directed, deduplicated edge table (src: Long, dst: Long, weight: Double). */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val nation   = Tables(spark, dir, "nation")
    val customer = Tables(spark, dir, "customer")
    val supplier = Tables(spark, dir, "supplier")
    val orders   = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")

    val n2r = nation.select(
      (col("n_nationkey").cast("long") + NATION).as("src"),
      col("n_regionkey").cast("long").as("dst"),
      lit(1.0).as("weight"))
    val c2n = customer.select(
      (col("c_custkey").cast("long") + CUST).as("src"),
      (col("c_nationkey").cast("long") + NATION).as("dst"),
      lit(1.0).as("weight"))
    val s2n = supplier.select(
      (col("s_suppkey").cast("long") + SUPP).as("src"),
      (col("s_nationkey").cast("long") + NATION).as("dst"),
      lit(1.0).as("weight"))
    val c2o = orders.select(
      (col("o_custkey").cast("long") + CUST).as("src"),
      (col("o_orderkey").cast("long") + ORDER).as("dst"),
      lit(1.0).as("weight"))
    def liEdge(srcCol: String, srcBase: Long, dstCol: String, dstBase: Long) =
      lineitem
        .groupBy(
          (col(srcCol).cast("long") + srcBase).as("src"),
          (col(dstCol).cast("long") + dstBase).as("dst"))
        .agg(count(lit(1)).cast("double").as("weight"))
    val o2p = liEdge("l_orderkey", ORDER, "l_partkey", PART)
    val o2s = liEdge("l_orderkey", ORDER, "l_suppkey", SUPP)
    val p2s = liEdge("l_partkey", PART, "l_suppkey", SUPP)

    n2r.unionAll(c2n).unionAll(s2n).unionAll(c2o)
      .unionAll(o2p).unionAll(o2s).unionAll(p2s)
  }

  /** SQL equivalent of [[edges]] for the DuckDB oracle (as a CTE body). */
  val edgesSql: String =
    s"""SELECT CAST(n_nationkey AS BIGINT) + $NATION AS src,
       |       CAST(n_regionkey AS BIGINT) AS dst, CAST(1.0 AS DOUBLE) AS weight FROM nation
       |UNION ALL
       |SELECT CAST(c_custkey AS BIGINT) + $CUST, CAST(c_nationkey AS BIGINT) + $NATION,
       |       CAST(1.0 AS DOUBLE) FROM customer
       |UNION ALL
       |SELECT CAST(s_suppkey AS BIGINT) + $SUPP, CAST(s_nationkey AS BIGINT) + $NATION,
       |       CAST(1.0 AS DOUBLE) FROM supplier
       |UNION ALL
       |SELECT CAST(o_custkey AS BIGINT) + $CUST, CAST(o_orderkey AS BIGINT) + $ORDER,
       |       CAST(1.0 AS DOUBLE) FROM orders
       |UNION ALL
       |SELECT CAST(l_orderkey AS BIGINT) + $ORDER, CAST(l_partkey AS BIGINT) + $PART,
       |       CAST(COUNT(*) AS DOUBLE) FROM lineitem GROUP BY 1, 2
       |UNION ALL
       |SELECT CAST(l_orderkey AS BIGINT) + $ORDER, CAST(l_suppkey AS BIGINT) + $SUPP,
       |       CAST(COUNT(*) AS DOUBLE) FROM lineitem GROUP BY 1, 2
       |UNION ALL
       |SELECT CAST(l_partkey AS BIGINT) + $PART, CAST(l_suppkey AS BIGINT) + $SUPP,
       |       CAST(COUNT(*) AS DOUBLE) FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Undirected (symmetrized) view: each directed edge emitted both ways.
    * The reference treats edges undirected for CC/LPA/triangles
    * (graph_objects.hpp num_edges() = in+out).
    */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("weight"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))

  /** Per-vertex degrees: (id, out_deg, in_deg, deg). Matches the reference's
    * degree file (sharder.hpp:996-1006) semantics.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.select(col("src").as("id"), lit(1L).as("o"), lit(0L).as("i"))
    val in  = edges.select(col("dst").as("id"), lit(0L).as("o"), lit(1L).as("i"))
    out.unionAll(in).groupBy("id")
      .agg(sum("o").as("out_deg"), sum("i").as("in_deg"))
      .withColumn("deg", col("out_deg") + col("in_deg"))
  }

  /** All vertex ids appearing as an endpoint. */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct()

  /** [[vertices]] hash-partitioned by id into `parts` partitions with no
    * extra exchange when the ambient shuffle partitioning already matches:
    * distinct's own aggregate exchange IS hashpartitioning(id,
    * spark.sql.shuffle.partitions), so the explicit repartition every
    * iterative init used to add on top of it was a second full V-row
    * exchange of identical layout (guide §2.4).
    */
  def verticesPartitioned(spark: SparkSession, edges: DataFrame,
      parts: Int): DataFrame = {
    val v = vertices(edges)
    if (parts == spark.conf.get("spark.sql.shuffle.partitions", "-1").toInt) v
    else v.repartition(parts, col("id"))
  }
}

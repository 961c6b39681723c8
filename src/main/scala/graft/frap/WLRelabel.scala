package graft.frap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weisfeiler–Lehman-style iterative vertex relabeling over typed provenance
  * graphs — the Spark dataflow form of the reference's VertexRelabel program
  * (/root/reference/myapps/vertex.cpp:30-347, string prototype
  * camflow/vertexrelabel.cpp:94-147): initial label = vertex type; each
  * round a vertex's new label encodes (own label, sorted incoming
  * (label, edgeType) multiset, sorted outgoing (label, edgeType) multiset).
  *
  * Deviations (documented): the reference dictionary-encodes label strings
  * into dense ints through a shared singleton map (kernelmaps.cpp:39-49,
  * insert_relabel) and alternates update/swap supersteps; here labels are
  * md5 digests of the same canonical strings — a deterministic, coordination-
  * free bijection of the dictionary codes, under which label histograms (and
  * therefore every kernel distance) are invariant. All graphs relabel
  * *concurrently* in one Dataset keyed by graphId instead of one engine run
  * per graph (main.cpp:113-119) — that is the Spark-native scale win.
  *
  * Input edge schema: (graph_id, src, dst, src_type, dst_type, edge_type).
  */
object WLRelabel {

  /** Initial labels: vertex type as claimed by any incident edge
    * (vertex.cpp:104-120 reads the type off an out-edge's new_src or an
    * in-edge's new_dst).
    */
  def initialLabels(edges: DataFrame): DataFrame =
    edges.select(col("graph_id"), col("src").as("id"),
      col("src_type").cast("string").as("label"))
      .unionAll(edges.select(col("graph_id"), col("dst").as("id"),
        col("dst_type").cast("string").as("label")))
      .groupBy("graph_id", "id")
      .agg(min("label").as("label"))

  /** One WL round: md5("self|in1 in2 ...|out1 out2 ...") with sorted
    * "label#edgeType" neighbor signatures.
    */
  def step(labels: DataFrame, edges: DataFrame): DataFrame = {
    val lbl = labels.select(col("graph_id"), col("id"), col("label"))
    // rename edge columns before joining: `labels` derives from `edges`, so
    // unaliased column refs would be an ambiguous self-join
    val e = edges.select(col("graph_id").as("eg"), col("src"), col("dst"),
      col("edge_type"))
    val inMsgs = lbl
      .join(e, lbl("graph_id") === col("eg") && lbl("id") === col("src"))
      .select(col("eg").as("graph_id"), col("dst").as("id"),
        concat_ws("#", col("label"), col("edge_type")).as("sig"))
      .groupBy("graph_id", "id")
      .agg(concat_ws(" ", sort_array(collect_list("sig"))).as("in_sig"))
    val outMsgs = lbl
      .join(e, lbl("graph_id") === col("eg") && lbl("id") === col("dst"))
      .select(col("eg").as("graph_id"), col("src").as("id"),
        concat_ws("#", col("label"), col("edge_type")).as("sig"))
      .groupBy("graph_id", "id")
      .agg(concat_ws(" ", sort_array(collect_list("sig"))).as("out_sig"))
    lbl
      .join(inMsgs, Seq("graph_id", "id"), "left")
      .join(outMsgs, Seq("graph_id", "id"), "left")
      .select(col("graph_id"), col("id"),
        md5(concat_ws("|",
          col("label"),
          coalesce(col("in_sig"), lit("")),
          coalesce(col("out_sig"), lit("")))).as("label"))
  }

  /** Run `iters` WL rounds; returns (graph_id, id, iter, label) for every
    * iteration 0..iters (iteration 0 = initial type labels). The union over
    * iterations is what feeds the kernel histograms, mirroring the
    * reference's per-update label_map inserts (kernelmaps.cpp:54-62).
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    var labels = initialLabels(edges).localCheckpoint(true)
    var acc = labels.withColumn("iter", lit(0))
    for (t <- 1 to iters) {
      labels = step(labels, edges).localCheckpoint(true)
      acc = acc.unionAll(labels.withColumn("iter", lit(t)))
    }
    acc.select("graph_id", "id", "iter", "label")
  }

  /** Per-graph label histogram over all WL iterations:
    * (graph_id, label, cnt) — the kernel map (kernelmaps.cpp:54-78).
    */
  def kernelCounts(wlLabels: DataFrame): DataFrame =
    wlLabels.groupBy("graph_id", "label").agg(count(lit(1)).as("cnt"))

  /** Shared DuckDB CTE block replicating [[run]]+[[kernelCounts]] over a
    * persisted typed-edge fixture: md5 labels, '#'-joined neighbor sigs
    * sorted lexicographically — identical strings to the Spark side.
    * Ends with `kc(graph_id, label, cnt)`.
    */
  private def wlCtes(fixtureSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""i$k AS (
         |  SELECT e.graph_id, e.dst AS id,
         |         string_agg(l.label || '#' || e.edge_type, ' '
         |           ORDER BY l.label || '#' || e.edge_type) AS sig
         |  FROM e JOIN l${k - 1} l
         |    ON l.graph_id = e.graph_id AND l.id = e.src
         |  GROUP BY 1, 2),
         |o$k AS (
         |  SELECT e.graph_id, e.src AS id,
         |         string_agg(l.label || '#' || e.edge_type, ' '
         |           ORDER BY l.label || '#' || e.edge_type) AS sig
         |  FROM e JOIN l${k - 1} l
         |    ON l.graph_id = e.graph_id AND l.id = e.dst
         |  GROUP BY 1, 2),
         |l$k AS MATERIALIZED (
         |  SELECT l.graph_id, l.id,
         |         md5(l.label || '|' || COALESCE(i.sig, '') || '|' ||
         |             COALESCE(o.sig, '')) AS label
         |  FROM l${k - 1} l
         |  LEFT JOIN i$k i ON i.graph_id = l.graph_id AND i.id = l.id
         |  LEFT JOIN o$k o ON o.graph_id = l.graph_id AND o.id = l.id)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (1 to iters)
      .map(k => s"UNION ALL SELECT graph_id, label FROM l$k").mkString(" ")
    s"""e AS MATERIALIZED (SELECT * FROM $fixtureSql),
       |l0 AS MATERIALIZED (
       |  SELECT graph_id, id, MIN(label) AS label FROM (
       |    SELECT graph_id, src AS id, CAST(src_type AS VARCHAR) AS label FROM e
       |    UNION ALL
       |    SELECT graph_id, dst, CAST(dst_type AS VARCHAR) FROM e)
       |  GROUP BY 1, 2),
       |$rounds,
       |kc AS MATERIALIZED (
       |  SELECT graph_id, label, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT graph_id, label FROM l0 $unions)
       |  GROUP BY 1, 2)""".stripMargin
  }

  def kernelOracleSql(fixtureSql: String, iters: Int): String =
    s"""WITH ${wlCtes(fixtureSql, iters)}
       |SELECT graph_id, label, cnt FROM kc ORDER BY 1, 2""".stripMargin

  /** Oracle for Kernels.euclideanMatrix over the same WL counts:
    * dist = sqrt(Σa² + Σb² − 2Σab), quantized q6.
    */
  def distanceOracleSql(fixtureSql: String, iters: Int): String =
    s"""WITH ${wlCtes(fixtureSql, iters)},
       |norms AS (SELECT graph_id, SUM(cnt * cnt) AS sq FROM kc GROUP BY 1),
       |pairs AS (
       |  SELECT a.graph_id AS ga, b.graph_id AS gb, a.sq AS sqa, b.sq AS sqb
       |  FROM norms a, norms b WHERE a.graph_id < b.graph_id),
       |dots AS (
       |  SELECT a.graph_id AS ga, b.graph_id AS gb,
       |         SUM(a.cnt * b.cnt) AS dot
       |  FROM kc a JOIN kc b ON a.label = b.label
       |  WHERE a.graph_id < b.graph_id GROUP BY 1, 2)
       |SELECT p.ga, p.gb,
       |  CAST(FLOOR(sqrt(p.sqa + p.sqb - 2.0 * COALESCE(d.dot, 0)) * 1e6 + 0.5)
       |    AS BIGINT) AS dist_q6
       |FROM pairs p LEFT JOIN dots d ON d.ga = p.ga AND d.gb = p.gb
       |ORDER BY p.ga, p.gb""".stripMargin
}

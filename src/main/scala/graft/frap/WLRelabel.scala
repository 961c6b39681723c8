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
}

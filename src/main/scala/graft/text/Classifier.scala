package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable linear document classifier over hashed bag-of-words
  * features — the CCNet/fastText role in a pretraining pipeline: learn a
  * cheap linear filter from a labeled sample (domain, quality,
  * wiki-vs-crawl), then score the whole corpus with one scan. The model
  * is multinomial Naive Bayes with add-one smoothing expressed as a
  * linear score (log-odds weights), the textbook closed form — training
  * is ONE corpus pass (two aggregates), no iteration, which is what
  * makes it exactly replayable cross-engine where an SGD loop is not.
  *
  * Everything is exact 64-bit integer arithmetic except two `ln` calls
  * per trained feature, each quantized q6 (`floor(ln(·)·1e6 + 0.5)`)
  * BEFORE any summation, so per-doc scores are order-free integer sums
  * (the LinkPrediction/Betweenness discipline). Feature hashing is the
  * md5-prefix idiom every dedup operator here uses (engine-portable).
  *
  * Scale shape: feature extraction is a pure scan + one (doc, fid)
  * aggregate; training is one feats⋈labels equi-join + one fid-sized
  * aggregate (map-side combinable) + a broadcast 1-row totals frame;
  * scoring is one feats⋈weights equi-join (weights ≤ F+1 rows →
  * broadcast) + one per-doc sum. Nothing is corpus×corpus; the whole
  * chain is the doc_tfidf cost family.
  *
  * Deviation from full NB (documented): features unseen in training
  * contribute 0 at scoring time instead of the smoothed novel-token
  * log-ratio — the standard hashed-linear-model convention (weights ARE
  * the model; fastText does the same).
  */
object Classifier {

  /** Hashed token-count features (doc_id, fid, x): fid = first 7 hex
    * digits of md5(token) mod `f`, x = count of tokens in the bucket.
    */
  def hashedCounts(docs: DataFrame, f: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 7), 16, 10).cast("long") % f)
          .as("fid"))
      .groupBy("doc_id", "fid").agg(count(lit(1)).as("x"))

  /** Train NB log-odds weights from (doc_id, fid, x) features and
    * (doc_id, y) labels (y ∈ {+1, −1}): returns
    * (weights (fid, w), bias — a broadcastable 1-row frame (b)).
    */
  def trainNb(feats: DataFrame, labels: DataFrame,
      f: Int): (DataFrame, DataFrame) = {
    def q6ln(c: org.apache.spark.sql.Column) =
      floor(log(c) * 1e6 + 0.5).cast("long")
    val tr = feats.join(labels, "doc_id")
    val perF = tr.groupBy("fid").agg(
      sum(when(col("y") > 0, col("x")).otherwise(0L)).as("cp"),
      sum(when(col("y") < 0, col("x")).otherwise(0L)).as("cn"))
    val totals = tr.agg(
      sum(when(col("y") > 0, col("x")).otherwise(0L)).as("tp"),
      sum(when(col("y") < 0, col("x")).otherwise(0L)).as("tn"))
    val weights = perF.crossJoin(broadcast(totals))
      .select(col("fid"),
        (q6ln((col("cp") + 1).cast("double") /
          (col("tp") + lit(f)).cast("double")) -
          q6ln((col("cn") + 1).cast("double") /
            (col("tn") + lit(f)).cast("double"))).as("w"))
    val bias = labels.agg(
      sum(when(col("y") > 0, 1L).otherwise(0L)).as("npos"),
      sum(when(col("y") < 0, 1L).otherwise(0L)).as("nneg"))
      .select(q6ln(col("npos").cast("double") / col("nneg").cast("double"))
        .as("b"))
    (weights, bias)
  }

  /** Score every doc in `feats`: margin = b + Σ x·w over trained
    * features, pred = sign(margin) with 0 → −1. Docs whose features are
    * all untrained still score (bias only).
    */
  def classify(feats: DataFrame, weights: DataFrame,
      bias: DataFrame): DataFrame = {
    val s = feats.join(broadcast(weights), Seq("fid"))
      .groupBy("doc_id").agg(sum(col("x") * col("w")).as("m"))
    feats.select("doc_id").distinct()
      .join(s, Seq("doc_id"), "left")
      .crossJoin(broadcast(bias))
      .select(col("doc_id"),
        (coalesce(col("m"), lit(0L)) + col("b")).as("margin"))
      .withColumn("pred",
        when(col("margin") > 0, 1L).otherwise(-1L))
  }
}

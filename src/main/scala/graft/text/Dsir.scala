package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a target
  * distribution by importance weights under hashed n-gram bag-of-words
  * models, then resample with the Gumbel top-k trick. The data-SELECTION
  * stage of a pretraining pipeline, sitting between quality filtering and
  * export: "give me the k raw documents most like my target domain".
  *
  * Scale shape: the feature stream (unigrams + bigrams hashed into B
  * buckets) is a zero-shuffle array transform per document; both bucket
  * models are B-sized aggregates (B ≈ 10k in the paper — broadcast-sized,
  * NEVER corpus-sized); per-document weights need one doc×bucket groupBy
  * (map-side combinable) plus one equi-join against the broadcast bucket
  * table; selection is a global top-k (TakeOrdered — no full sort). Every
  * per-document stage touches a document's own features only, so the plan
  * is corpus-linear and the 100 TB form is identical.
  *
  * Determinism discipline: log-ratio terms are quantized to 1e-6 PER
  * (doc, bucket) TERM before the integer sum (the lmPerplexity rule —
  * order-free across partitionings and engines); `ln` operates on
  * identical IEEE doubles in Spark and DuckDB (exact-int rationals in,
  * correctly-rounded division and log out); the Gumbel draw seeds from the
  * engine-portable integer Lehmer stream, so the selected set is
  * bit-reproducible.
  */
object Dsir {

  private val P = 2147483647L

  /** Hashed unigram+bigram feature buckets of every document:
    * (doc_id, b, c) with b in [0, buckets). md5-derived (15 hex digits →
    * 60-bit int, mod B) — the engine-portable hash family every dedup
    * operator here uses.
    */
  def featureCounts(docs: DataFrame, buckets: Int): DataFrame = {
    val w = TextOps.tokens(col("text"))
    val unis = docs.select(col("doc_id"), explode(w).as("f"))
    val bis = docs.select(col("doc_id"),
      explode(TextOps.shingles(w, 2)).as("f"))
    unis.unionAll(bis)
      .select(col("doc_id"),
        (conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long")
          % buckets).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Per-document DSIR importance weights against a target slice.
    * `isTarget` marks the target-distribution documents (e.g. a trusted
    * domain); the raw model is the WHOLE corpus. Add-one smoothing over
    * the B buckets on both models. Returns (doc_id, logw_q6): the
    * 1e-6-quantized log importance weight Σ_b c_b·(ln p_b − ln q_b),
    * summed as integers.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val fc = featureCounts(docs, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtIds = docs.filter(isTarget).select(col("doc_id"))
    val tgt = fc.join(tgtIds, Seq("doc_id"))
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    // every observed bucket appears in the raw model by construction, so
    // a left join from raw covers the target's support
    val raw = fc.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val model = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = model.agg(sum(col("cr")).as("totr"),
      sum(col("ct")).as("tott"))
    // ln p − ln q on identical IEEE doubles in both engines: numerators
    // and denominators are exact longs, division is correctly rounded
    val lr = model.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") /
          (col("tott") + buckets).cast("double")) -
          log((col("cr") + 1).cast("double") /
            (col("totr") + buckets).cast("double"))).as("lr"))
    val out = fc.join(lr, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(floor(col("c").cast("double") * col("lr") * 1e6 + 0.5)
        .cast("long")).as("logw_q6"))
    val res = docs.select(col("doc_id"))
      .join(out, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("logw_q6"), lit(0L)).as("logw_q6"))
      .localCheckpoint(true)
    fc.unpersist(false)
    res
  }

  /** Gumbel top-k resampling over the importance weights: score =
    * logw + Gumbel(u), u from the Lehmer stream (u ∈ (0,1), never 0 or 1),
    * quantized to q6 integers so the ranking is order- and engine-free;
    * keep the `k` highest (doc_id ascending on ties). This is sampling
    * WITHOUT replacement proportional to w^(1/T), T=1 — the paper's
    * selection rule.
    */
  def resample(docs: DataFrame, isTarget: Column, buckets: Int, k: Int,
      seed: Long = 42L): DataFrame = {
    val lw = importanceWeights(docs, isTarget, buckets)
    // u ∈ (0,1): +1 lifts off 0, /(P+1) keeps it below 1 (h < P)
    val u = (graft.algos.GraphOps.lehmerHash(col("doc_id"), lit(0L), seed)
      + 1L).cast("double") / (P + 1L).toDouble
    val g = -log(-log(u))
    lw.select(col("doc_id"), col("logw_q6"),
        (col("logw_q6") + floor(g * 1e6 + 0.5).cast("long")).as("score_q6"))
      .orderBy(col("score_q6").desc, col("doc_id"))
      .limit(k)
  }
}

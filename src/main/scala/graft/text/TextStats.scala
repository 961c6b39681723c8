package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps._

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, corpus-trained n-gram language identification, and
  * shingle fingerprinting. All pure column expressions / joins.
  */
object TextStats {

  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** (doc_id, n_chars, n_tokens): whitespace + regex token counting. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))

  /** Quality metrics per doc: sizes, stopword ratio, punctuation ratio,
    * mean token length, and a composite [0,1] score (quantized to 1e-6 for
    * engine-stable hashing). Heuristics in the spirit of C4/Gopher rules.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks,
      t => t.isInCollection(Stopwords))).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[\\p{Punct}]", ""))).cast("double")
    // Σ token lengths == length of the text with all whitespace removed
    val meanTokLen = when(nTok > 0,
      length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok)
      .otherwise(0.0)
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(0.0)
    val punctRatio = when(length(col("text")) > 0,
      nPunct / length(col("text"))).otherwise(0.0)
    // composite: enough tokens, some stopwords, sane token length, low punct
    val score =
      least(nTok / 50.0, lit(1.0)) * 0.4 +
        least(stopRatio * 10.0, lit(1.0)) * 0.2 +
        when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.0) * 0.2 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2
    docs.select(col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      floor(stopRatio * 1e6 + 0.5).cast("long").as("stop_ratio_q6"),
      floor(punctRatio * 1e6 + 0.5).cast("long").as("punct_ratio_q6"),
      floor(meanTokLen * 1e6 + 0.5).cast("long").as("mean_tok_len_q6"),
      floor(score * 1e6 + 0.5).cast("long").as("quality_q6"))
  }

  /** Character-trigram language profiles trained from labeled docs:
    * (lang, trigram, weight) — the `topK` most frequent trigrams per lang,
    * weight = relative frequency quantized. Small enough to broadcast.
    */
  def trainLangProfiles(docs: DataFrame, topK: Int = 100): DataFrame = {
    val tri = docs.select(col("lang"),
      explode(charTrigrams(col("text"))).as("trigram"))
      .groupBy("lang", "trigram").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(desc("cnt"), asc("trigram"))
    tri.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("lang"), col("trigram"),
        (lit(topK + 1) - col("rn")).cast("long").as("weight"))
  }

  /** Classify docs against trained profiles: (doc_id, lang_pred, score).
    * Profiles are broadcast (5 langs × topK rows). Ties → smaller lang.
    */
  def langId(docs: DataFrame, profiles: DataFrame): DataFrame = {
    val tri = docs.select(col("doc_id"),
      explode(charTrigrams(col("text"))).as("trigram"))
      .groupBy("doc_id", "trigram").agg(count(lit(1)).as("tf"))
    val scored = tri.join(broadcast(profiles), "trigram")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf") * col("weight")).as("score"))
    scored.groupBy("doc_id")
      .agg(max_by(col("lang"), struct(col("score"),
        (lit(0) - ascii(col("lang"))).as("tie"))).as("lang_pred"),
        max(col("score")).as("score"))
  }

  /** Document fingerprints: full-text md5 plus the minimum shingle-md5
    * (a 1-hash MinHash — stable under token-order-preserving edits far from
    * the minimizing window; the dataflow form of rolling-hash winnowing).
    */
  def fingerprints(docs: DataFrame, n: Int = 5): DataFrame = {
    val sh = docs.select(col("doc_id"), md5(col("text")).as("text_md5"),
      shingles(tokens(col("text")), n).as("sh"))
    sh.select(col("doc_id"), col("text_md5"),
      when(size(col("sh")) > 0,
        array_min(transform(col("sh"), s => md5(s))))
        .otherwise(col("text_md5")).as("min_shingle_md5"))
  }

  /** Repetition filters in the style of the Gopher/MassiveText rules
    * (Rae et al. 2021, table A1): documents dominated by one repeated
    * n-gram or by duplicated n-grams are boilerplate/spam and get culled
    * before pretraining. Per doc:
    *   - top2gram_frac:   count of the most frequent token 2-gram / all 2-grams
    *   - dup3gram_frac:   fraction of 3-gram occurrences that are repeats
    *                      (1 - distinct/total)
    *   - dup_tok_frac:    fraction of token occurrences that are repeats
    *
    * Every metric is a row-local column expression — the most-frequent-gram
    * count is a linear run-length fold over the SORTED gram array
    * (`aggregate`), not an explode+groupBy — so the whole pass is a zero
    * shuffle corpus scan inside whole-stage codegen, the only shape a
    * 100 TB quality gate can afford. Fractions are single IEEE divisions of
    * identical integers in both engines, then q6-quantized.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val g2 = shingles(toks, 2)
    val g3 = shingles(toks, 3)
    // longest equal-run in the sorted array == max multiplicity of any 2-gram
    val maxRun = aggregate(array_sort(g2),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    def q6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    def dupFrac(arr: org.apache.spark.sql.Column) =
      when(size(arr) > 0,
        (size(arr) - size(array_distinct(arr))).cast("double") /
          size(arr).cast("double")).otherwise(0.0)
    docs.select(col("doc_id"),
      q6(when(size(g2) > 0,
        maxRun.cast("double") / size(g2).cast("double")).otherwise(0.0))
        .as("top2gram_frac_q6"),
      q6(dupFrac(g3)).as("dup3gram_frac_q6"),
      q6(dupFrac(toks)).as("dup_tok_frac_q6"))
  }

  /** Email/phone patterns for [[piiScrub]], deliberately written in the
    * common subset of Java regex and RE2 (no backrefs, no lookaround) so the
    * DuckDB oracle applies the IDENTICAL patterns — the scrubbed-text hash
    * compare is then a genuine cross-engine regex-semantics check.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII scrubbing for a pretraining corpus: replace emails/phone-shaped
    * spans with placeholder tokens and count what was removed. Pure column
    * expressions (regexp_count / regexp_replace are codegen'd built-ins) —
    * a full-corpus scan with zero shuffle, the shape a 100 TB scrub pass
    * must have. Emails are scrubbed first so digit runs inside them are
    * never double-counted as phones.
    *
    * Returns (doc_id, n_emails, n_phones, scrubbed_md5).
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val deEmailed = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(deEmailed, lit(PhoneRe)).cast("long").as("n_phones"),
      md5(regexp_replace(deEmailed, PhoneRe, "<PHONE>")).as("scrubbed_md5"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-statistics operators from the reference's parsers toolkit — the
  * two apps there that are real computations rather than format reshapes:
  *
  *  - [[bagOfWords]]: tokenize a document corpus into `(doc_id, word_id,
  *    cnt)` bag-of-words rows with a global word dictionary and per-document
  *    count thresholds — the LDA input prep of
  *    `/root/reference/toolkits/parsers/texttokens.cpp:54-105` (tokenize each
  *    line, `assign_id` into a shared `string2nodeid` map, emit
  *    `line word_id count` for counts within `[min_threshold,
  *    max_threshold]`, texttokens.cpp:88).
  *  - [[mutualInformation]]: the empirical mutual information between two
  *    categorical columns plus the marginal entropy H(X) —
  *    `/root/reference/toolkits/parsers/mi.cpp:198-241` (joint counts in
  *    `frommap`, marginals in `p_x`/`p_y`, `mi += p_xy·log2(p_xy/(px·py))`,
  *    `h -= px·log2(px)`).
  *
  * Deviations (documented, deliberate): the reference assigns word ids in
  * first-encounter order under an OpenMP parallel-for (texttokens.cpp:140-142
  * — ids depend on thread interleaving, so two runs disagree); a distributed
  * engine needs a deterministic dictionary, so ids here are the alphabetical
  * dense rank (1-based), assigned with the same range-sort + per-partition
  * offset scan as [[graft.derive.EdgeDerive.catalog]] — never a
  * single-partition window. Tokens are uniformly required to have length ≥ 2
  * (the reference skips length-1 tokens except the first of each line,
  * texttokens.cpp:72-81 — a strtok artifact, not semantics).
  */
object FeatureStats {

  /** Whitespace tokens of length ≥ 2 — texttokens.cpp's keep rule applied
    * uniformly. Pure built-ins, stays in whole-stage codegen.
    */
  def words(text: Column): Column =
    filter(TextOps.tokens(text), t => length(t) >= 2)

  /** Global word dictionary `(word, word_id)`: 1-based dense alphabetical
    * ids. Distinct is map-side combinable; the id assignment is a range
    * shuffle + linear scan (two passes over the vocabulary, no driver
    * collection) — at web scale the vocabulary is the small side of the
    * corpus but can still exceed driver memory, so a window over one
    * partition would be wrong here.
    */
  def wordDictionary(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(words(col("text"))).as("word"))
      .distinct()
      .repartitionByRange(col("word"))
      .sortWithinPartitions("word")
    val withIds = vocab.rdd.zipWithIndex.map { case (row, i) =>
      (row.getString(0), i + 1L)
    }
    spark.createDataFrame(withIds).toDF("word", "word_id")
  }

  /** Bag-of-words rows `(doc_id, word_id, cnt)` for LDA-style consumers:
    * per-document word counts within `[minCount, maxCount]`
    * (texttokens.cpp:88), words resolved against [[wordDictionary]].
    *
    * Shape at 100 TB: explode + groupBy(doc_id, word) is ONE shuffle with
    * map-side combine (partial counts per task); the dictionary join is an
    * equi-join on `word` — vocabulary-sized, so Spark can broadcast it when
    * small and shuffle-hash it when not; AQE decides from runtime stats.
    */
  def bagOfWords(docs: DataFrame, minCount: Long = 1L,
                 maxCount: Long = Long.MaxValue): DataFrame = {
    val dict = wordDictionary(docs)
    docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(minCount, maxCount))
      .join(dict, "word")
      .select(col("doc_id"), col("word_id"), col("cnt"))
  }

  /** TF-IDF weights over the [[bagOfWords]] rows: for each (doc, word),
    * tf × ln((N+1)/(df+1)) with raw-count tf, smoothed idf (spark.ml IDF's
    * formula — never divides by zero, new words at serve time get the
    * max-idf ceiling), N = corpus document count, df = documents containing
    * the word. The quality-classifier / relevance-features step of a text
    * pipeline, composed from the same bag-of-words the LDA prep feeds.
    *
    * Shape at 100 TB: df is one map-side-combinable count over the
    * (doc, word) rows; N rides in as a broadcast 1-row frame (no driver
    * action); the df join is vocabulary-sized like the dictionary join.
    */
  def tfIdf(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    val bow = bagOfWords(docs, minCount)
    val n = docs.select(count(lit(1)).as("__n"))
    val dfreq = bow.groupBy("word_id").agg(count(lit(1)).as("__df"))
    bow.join(dfreq, "word_id").crossJoin(broadcast(n))
      .select(col("doc_id"), col("word_id"),
        (col("cnt") *
          log((col("__n") + 1.0) / (col("__df") + 1.0))).as("tfidf"))
  }

  /** Empirical mutual information between two categorical columns, as one
    * row `(n, unique_x, unique_y, mi_q6, h_x_q6)` — mi.cpp:198-241's exact
    * quantities (joint/marginal relative frequencies, log2), quantized to
    * 1e-6 for engine-stable comparison.
    *
    * Everything is dataflow: the total count joins in as a broadcast 1-row
    * frame (no driver action), the marginals are categorical-cardinality
    * tables broadcast into the joint join, and every groupBy is map-side
    * combinable — at 100 TB this is two scan-aggregates and a tiny join.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).as("x")
    val y = col(yCol).as("y")
    val nRow = df.agg(count(lit(1)).cast("double").as("n"))
    val xy = df.groupBy(x, y).agg(count(lit(1)).cast("double").as("cxy"))
    val px = df.groupBy(x).agg(count(lit(1)).cast("double").as("cx"))
    val py = df.groupBy(y).agg(count(lit(1)).cast("double").as("cy"))

    val miRow = xy
      .join(broadcast(px), "x")
      .join(broadcast(py), "y")
      .crossJoin(broadcast(nRow))
      .select((col("cxy") / col("n") * log(2.0,
        (col("cxy") * col("n")) / (col("cx") * col("cy")))).as("term"))
      .agg(sum(col("term")).as("mi"))

    val hxRow = px.crossJoin(broadcast(nRow))
      .agg((lit(0.0) - sum(col("cx") / col("n") *
        log(2.0, col("cx") / col("n")))).as("hx"),
        count(lit(1)).as("unique_x"))
    val uyRow = py.agg(count(lit(1)).as("unique_y"))

    nRow.crossJoin(broadcast(hxRow)).crossJoin(broadcast(uyRow))
      .crossJoin(broadcast(miRow))
      .select(col("n").cast("long").as("n"),
        col("unique_x"), col("unique_y"),
        floor(col("mi") * 1e6 + 0.5).cast("long").as("mi_q6"),
        floor(col("hx") * 1e6 + 0.5).cast("long").as("h_x_q6"))
  }
}

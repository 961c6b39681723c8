package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, arXiv:
  * 1508.07909) — the tokenizer-TRAINING stage of a pretraining pipeline,
  * next to the fixed whitespace/regex token counters.
  *
  * The scale shape is the classic one: BPE trains on the word-FREQUENCY
  * table, not the corpus — so the only corpus-sized work is ONE
  * map-side-combinable groupBy(word) up front (and, for [[tokenize]], one
  * final vocabulary join back). Every merge iteration runs on the
  * vocabulary-sized table: pair counting is an explode + groupBy over
  * ~|vocab| rows, the argmax pair is a 1-row driver read (bounded by
  * numMerges, the Hits-norms pattern), and the merge application is a
  * per-word array fold. At 100 TB the corpus never re-enters the loop.
  *
  * Deviations from the reference tokenizers' behavior, documented:
  * no end-of-word marker (words are whitespace tokens already), and pair
  * counts include overlapping occurrences (symbol bigrams, as Sennrich's
  * counter does).
  *
  * Merge application is greedy leftmost non-overlapping — the fold below
  * is provably that: a merged token is strictly longer than `l`, so it can
  * never immediately re-merge as the left side of the same rule, which is
  * exactly the "continue scanning after the merged pair" semantics. The
  * fold is a higher-order `aggregate` (CodegenFallback-interpreted), fine
  * here because it runs on the vocabulary-sized table — the measured
  * mapPartitions bar (KmeansScaleProbe's 40x) applies to corpus-sized hot
  * loops, not this one.
  */
object Bpe {

  /** (word, freq, syms): the word-frequency table with each word split to
    * single-character symbols. The ONE corpus-sized aggregation.
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // Spark's split(w, "") keeps a trailing "" (Java split limit -1)
      .select(col("word"), col("freq"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))

  /** One greedy-leftmost application of merge (l, r) to a symbol array.
    * try_element_at(acc, -1) is null on the empty accumulator, so the
    * comparison is null -> otherwise-branch; no ANSI out-of-bounds risk.
    */
  private def applyMerge(syms: org.apache.spark.sql.Column,
                         l: String, r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Train `numMerges` merges. Returns (merges, wordSyms):
    * merges = (rank, left_sym, right_sym, cnt) in learn order, tie-broken
    * deterministically (cnt desc, left asc, right asc — binary string
    * order, engine-portable on this ASCII corpus); wordSyms = the final
    * (word, freq, syms) symbolization, ready for [[tokenize]].
    * Stops early (fewer rows) if no pair remains.
    */
  def train(docs: DataFrame, numMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var wf = wordFreqs(docs).localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (rank <- 1 to numMerges if !done) {
      val top = wf.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1 row, bounded by numMerges reads total
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        learned += ((rank, l, r, c))
        wf = wf.select(col("word"), col("freq"),
          applyMerge(col("syms"), l, r).as("syms")).localCheckpoint(true)
      }
    }
    import spark.implicits._
    val merges = learned.toSeq
      .toDF("rank", "left_sym", "right_sym", "cnt")
      .select(col("rank").cast("long").as("rank"), col("left_sym"),
        col("right_sym"), col("cnt"))
    (merges, wf)
  }

  /** Tokenize the corpus with a trained symbolization: (doc_id, n_words,
    * n_bpe_tokens). Corpus-sized equi-join on `word` against the
    * vocabulary-sized wordSyms (AQE broadcasts it when small), then a
    * map-side-combinable groupBy; docs whose every token is out-of-vocab
    * (or empty) keep zero counts via the left join.
    */
  def tokenize(docs: DataFrame, wordSyms: DataFrame): DataFrame = {
    val counted = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(wordSyms.select(col("word"), size(col("syms")).as("n_syms")),
        Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).cast("long").as("n_bpe_tokens"))
    docs.select(col("doc_id")).join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}

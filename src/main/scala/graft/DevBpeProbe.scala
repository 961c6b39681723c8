package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): BPE merge-loop cost at realistic merge counts.
  * The round-5 verdict named the job-per-merge loop as one of two scale
  * costs (32-64 k merges ≈ tens of thousands of sequential Spark jobs);
  * the round-6 driver-local incremental loop must show >= 1 k merges in
  * minutes, not hours. Corpus: the sf0.1 documents table, word-enriched by
  * suffixing each doc's tokens with its doc_id bucket so the vocabulary is
  * large enough to sustain thousands of merges.
  *
  *   dev/run.sh graft.DevBpeProbe [numMerges] [sfDir]
  */
object DevBpeProbe {
  def main(args: Array[String]): Unit = {
    val numMerges = if (args.nonEmpty) args(0).toInt else 2000
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir, "documents")
      // enrich vocabulary: every token additionally appears with a
      // deterministic md5-derived suffix, yielding tens of thousands of
      // distinct words so the merge loop cannot exhaust pairs early
      .select(col("doc_id"), concat_ws(" ", col("text"),
        concat_ws(" ", transform(split(col("text"), "\\s+"), w =>
          concat(w, lit("-"), substring(
            md5(concat(w, col("doc_id").cast("string"))), 1, 6))))).as("text"))
    val t0 = System.nanoTime()
    val wf = graft.text.Bpe.wordFreqs(docs).localCheckpoint(true)
    val vocab = wf.count()
    val tPrep = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (merges, _) = graft.text.Bpe.train(docs, numMerges)
    val got = merges.count()
    val tTrain = (System.nanoTime() - t1) / 1e9
    println(f"[bpe-probe] vocab=$vocab corpus_pass=$tPrep%.1fs " +
      f"merges=$got/$numMerges train_total=$tTrain%.1fs " +
      f"per_merge_ms=${tTrain * 1000 / math.max(got, 1)}%.2f")
    spark.stop()
  }
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage in a pretraining corpus (beyond the reference's own
  * surface; first-class for the 100 TB training-data pipeline this engine
  * targets, alongside the dedup family in [[Dedup]]).
  *
  * Scale design: the benchmark side is SMALL by construction (eval suites
  * are thousands of items, not billions), so its shingle set is broadcast —
  * the 100 TB corpus side streams through one hash join with no shuffle of
  * the corpus at all, and nothing ever pairs documents with documents.
  * Tokenization/shingling reuses [[TextOps]] (codegen-friendly built-ins,
  * no UDFs), so the scan stays inside whole-stage codegen.
  */
object Decontaminate {

  /** (doc_id, bench_id, hits): corpus docs sharing at least `minHits`
    * DISTINCT word n-grams with a benchmark item.
    *
    * @param docs  corpus (doc_id, text)
    * @param bench benchmark items (bench_id, text); small → broadcast
    * @param n     shingle width in tokens
    * @param minHits flag threshold on distinct shared shingles
    */
  def flag(docs: DataFrame, bench: DataFrame, n: Int = 3,
      minHits: Int = 2): DataFrame = {
    val d = Dedup.docShingles(docs, n)
    val b = bench.select(col("bench_id"),
        explode(shingles(tokens(col("text")), n)).as("shingle"))
      .distinct()
    d.join(broadcast(b), "shingle")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }
}

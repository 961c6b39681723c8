package graft.cf

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Topic modeling — the reference toolkit's LDA app
  * (/root/reference/toolkits/collaborative_filtering/lda.cpp, Gibbs-sampled
  * on GraphChi's bipartite doc-word graph) via Spark's native
  * `org.apache.spark.ml.clustering.LDA` (online variational Bayes — the
  * distributed-dataflow counterpart of the sampler). Input is the same
  * bipartite shape: (doc, word, count) rows → per-doc sparse count vectors.
  */
object Topics {

  final case class Model(
      topicsMatrix: DataFrame, // (topic, term_indices, term_weights)
      docTopics: DataFrame,    // (doc, topic_distribution)
      logPerplexity: Double)

  /** Per-doc sparse term-count vectors from (doc, word-index, count) rows.
    * `vocabSize` must exceed every word index.
    */
  def docVectors(counts: DataFrame, vocabSize: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.select(col("doc").cast("long"), col("word").cast("int"),
      col("cnt").cast("double"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (doc, rows) =>
        val entries = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
        (doc, Vectors.sparse(vocabSize, entries.map(_._1).toArray,
          entries.map(_._2).toArray): MlVector)
      }
      .toDF("doc", "features")
  }

  /** Train LDA; deterministic for a fixed seed.
    *
    * @param optimizer "online" (variational Bayes, minibatched — the
    *   default) or "em" — expectation-maximization over the distributed
    *   doc-term graph, the closer counterpart of the reference's collapsed
    *   Gibbs sampler (lda.cpp keeps per-token topic state on the bipartite
    *   graph and sweeps it in place; Spark's EM optimizer keeps exactly that
    *   per-edge topic posterior distributed on the same graph, where online
    *   VB holds only the topic-term matrix). Neither reproduces the
    *   sampler's draws; both converge to the same posterior mode family —
    *   the planted-corpus separation test is the contract.
    */
  def lda(spark: SparkSession, counts: DataFrame, vocabSize: Int,
      k: Int = 4, iters: Int = 20, seed: Long = 42L,
      optimizer: String = "online"): Model = {
    val docs = docVectors(counts, vocabSize)
    val m = new LDA().setK(k).setMaxIter(iters).setSeed(seed)
      .setOptimizer(optimizer)
      .setFeaturesCol("features")
      .fit(docs)
    val topics = m.describeTopics(10)
    val transformed = m.transform(docs)
      .select(col("doc"), col("topicDistribution"))
    Model(topics, transformed, m.logPerplexity(docs))
  }
}

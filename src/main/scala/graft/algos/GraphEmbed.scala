package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NetMF-style graph embeddings (Qiu et al. WSDM'18; Levy & Goldberg
  * NIPS'14): skip-gram over random-walk corpora is implicit matrix
  * factorization of the walk co-occurrence PPMI matrix, so the distributed
  * pipeline is walks → windowed co-occurrence counts → PPMI → truncated
  * SVD. Composes three already-verified components: the node2vec walk
  * corpus ([[RandomWalks.node2vecWalks]]), exact-integer aggregation, and
  * the Lanczos SVD ([[graft.cf.Spectral.svdEmbed]]).
  *
  * Everything up to the PPMI log is exact 64-bit integer arithmetic —
  * [[ppmiParts]] is the oracle surface (DuckDB replays the walks and the
  * window join bit-identically); the float log + SVD live behind it and
  * are property-tested on planted community structure instead
  * (sign/rotation of singular vectors is not cross-engine stable, cosine
  * geometry is).
  *
  * Scale shape: the co-occurrence self-join keys on walk_id — groups are
  * single walks (≤ steps rows), embarrassingly parallel, never a global
  * window. The PPMI marginals are two map-side-combinable aggregations
  * plus one broadcast of the 1-row total. The SVD's column dimension is
  * capped by `maxVocab` (ARPACK keeps a nCols×k dense V on the driver —
  * the same driver-bounded-model-size contract as svd.cpp); row indices
  * stay sparse vertex ids, so the row side scales with the graph.
  */
object GraphEmbed {

  /** Windowed skip-gram co-occurrence counts over a walk corpus
    * (walk_id, step, vertex): (u, v, n_uv) for every ordered pair at
    * distance 1..`window` within the same walk (both directions counted,
    * the standard symmetric-context convention).
    */
  def cooccurrence(corpus: DataFrame, window: Int): DataFrame = {
    val a = corpus.select(col("walk_id"), col("step").as("sa"),
      col("vertex").as("u"))
    val b = corpus.select(col("walk_id"), col("step").as("sb"),
      col("vertex").as("v"))
    a.join(b, "walk_id")
      .filter(col("sa") =!= col("sb") &&
        abs(col("sa") - col("sb")) <= window)
      .groupBy("u", "v").agg(count(lit(1)).as("n_uv"))
  }

  /** PPMI ingredients, all exact longs: (u, v, n_uv, n_u, n_v, total)
    * with n_u/n_v the row/column marginals and total the grand sum.
    * PPMI(u,v) = max(0, ln(n_uv·total / (n_u·n_v))) — left to the caller
    * so this frame stays integer-exact (the oracle surface).
    */
  def ppmiParts(cooc: DataFrame): DataFrame = {
    val ru = cooc.groupBy("u").agg(sum("n_uv").as("n_u"))
    val rv = cooc.groupBy("v").agg(sum("n_uv").as("n_v"))
    val tot = cooc.agg(sum("n_uv").as("total"))
    cooc.join(ru, "u").join(rv, "v")
      .crossJoin(broadcast(tot))
      .select("u", "v", "n_uv", "n_u", "n_v", "total")
  }

  /** End-to-end embeddings: uniform (p=q=1) node2vec walks from `sources`,
    * window-`window` co-occurrence, PPMI, rank-`dim` SVD. Returns
    * (id, embedding: Array[Float]) for every vertex that appears as a
    * co-occurrence row. Context vocabulary (the SVD's dense column space)
    * is the `maxVocab` highest-marginal vertices; the relabel window runs
    * over ≤ maxVocab rows by construction.
    */
  def embeddings(spark: SparkSession, edges: DataFrame, sources: DataFrame,
      walksPerSource: Int, steps: Int, window: Int, dim: Int,
      maxVocab: Int, seed: Long = 42L): DataFrame = {
    val corpus = RandomWalks.node2vecWalks(spark, edges, sources,
      walksPerSource, steps, p = 1, q = 1, seed = seed)
    val parts = ppmiParts(cooccurrence(corpus, window))
    val vocab = parts.select(col("v"), col("n_v")).distinct()
      .orderBy(col("n_v").desc, col("v")).limit(maxVocab)
      .withColumn("j",
        (row_number().over(Window.orderBy(col("n_v").desc, col("v"))) - 1)
          .cast("int"))
      .select("v", "j")
    val entries = parts.join(vocab, "v")
      .select(col("u").as("i"), col("j"),
        log((col("n_uv") * col("total")).cast("double") /
          (col("n_u") * col("n_v")).cast("double")).as("value"))
      .filter(col("value") > 0.0)
    graft.cf.Spectral.svdEmbed(entries, dim, maxVocab)
  }

  /** DuckDB oracle for [[ppmiParts]] over [[cooccurrence]] of the node2vec
    * corpus — replays the identical walk recurrence via
    * [[RandomWalks.node2vecCorpusCtes]], then the same window self-join
    * and integer marginals.
    */
  def ppmiOracleSql(edgesSql: String, nSources: Int, walksPerSource: Int,
      steps: Int, p: Int, q: Int, window: Int, seed: Long = 42L): String =
    s"""WITH ${RandomWalks.node2vecCorpusCtes(edgesSql, nSources,
      walksPerSource, steps, p, q, seed)},
       |pr AS (
       |  SELECT a.vertex AS u, b.vertex AS v, CAST(COUNT(*) AS BIGINT) AS n_uv
       |  FROM corpus a JOIN corpus b ON a.walk_id = b.walk_id
       |    AND a.step <> b.step AND ABS(a.step - b.step) <= $window
       |  GROUP BY 1, 2),
       |ru AS (SELECT u, CAST(SUM(n_uv) AS BIGINT) AS n_u FROM pr GROUP BY 1),
       |rv AS (SELECT v, CAST(SUM(n_uv) AS BIGINT) AS n_v FROM pr GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_uv) AS BIGINT) AS total FROM pr)
       |SELECT pr.u, pr.v, pr.n_uv, ru.n_u, rv.n_v, t.total
       |FROM pr JOIN ru USING (u) JOIN rv USING (v) CROSS JOIN t
       |ORDER BY u, v""".stripMargin
}

package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AdPredictor — Bayesian online CTR model of the reference toolkit
  * (/root/reference/toolkits/classification/adpredictor.cpp:1-348; the
  * Graepel et al. ICML'10 message-passing update). The model keeps a
  * Gaussian posterior (μ_j, σ²_j) per feature; for each sample i with
  * label y ∈ {−1,+1} and binary features N(i):
  *
  *   Σ_i = β² + Σ_{j∈N(i)} σ²_j          (adpredictor.cpp eq. 6 loop)
  *   t_i = y·(Σ_{j∈N(i)} μ_j)/√Σ_i
  *   μ_j += y·σ²_j/√Σ_i · v(t_i)         (eq. 9 left)
  *   σ²_j *= 1 − σ²_j/Σ_i · w(t_i)       (eq. 9 right)
  *
  * with v(t) = N(t)/Φ(t), w(t) = v(t)(v(t)+t).
  *
  * Optimizer deviation (documented): the reference streams samples
  * sequentially through shared in-memory μ/σ arrays, so each update sees all
  * earlier samples' posteriors (adpredictor.cpp:226-268). A sequential scan
  * does not distribute; this implementation runs *parallel BSP sweeps* —
  * every sample computes its message from the same sweep-start prior, and
  * each feature applies its aggregated update (sum of μ-deltas, product of
  * σ-factors via Σlog1p) once per sweep. This is the standard parallel-EP
  * reading of the same fixed point; the planted separable-clicks oracle is
  * the contract, not per-sample bit-parity.
  *
  * Everything is pure column expressions over two equi-joins per sweep
  * (edges⋈features grouped by sample, then edges⋈sample-stats grouped by
  * feature) — both shuffles key on bounded dimensions (samples, features),
  * map-side combinable, no driver state, no UDFs; Φ is an inlined
  * Abramowitz–Stegun 7.1.26 erf approximation (|err| < 1.5e-7, far inside
  * the planted-sign decision margin).
  */
object AdPredictor {

  /** Standard normal pdf. */
  private def pdf(t: Column): Column =
    exp(-t * t / 2.0) / math.sqrt(2 * math.Pi)

  /** Standard normal CDF via erf (Abramowitz–Stegun 7.1.26). */
  private def cdf(t: Column): Column = {
    val x = abs(t) / math.sqrt(2.0)
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = u * (lit(0.254829592) + u * (lit(-0.284496736) + u *
      (lit(1.421413741) + u * (lit(-1.453152027) + u * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-x * x)
    val erf = when(t >= 0, erfAbs).otherwise(-erfAbs)
    (lit(1.0) + erf) / 2.0
  }

  /** v(t) = N(t)/Φ(t), with the asymptotic branch once Φ(t) underflows the
    * polynomial approximation (t < −6). The expansion must keep the 1/(−t)
    * term — v(t) = −t + 1/(−t) + O(1/t³) — because the downstream
    * w(t) = v·(v+t) collapses to exactly 0 under the bare −t branch (the
    * σ² update would be silently skipped precisely where the evidence is
    * strongest, and w would jump from ≈1 to 0 across t = −6), whereas the
    * two-term form gives w = 1 − 1/t² → 1, Graepel et al.'s eq. 9 limit.
    */
  private def vFun(t: Column): Column =
    when(t < -6.0, -t - lit(1.0) / t).otherwise(pdf(t) / cdf(t))

  /** Train on a samples×features design. Returns the per-feature posterior
    * (feature, mu, sigma2).
    *
    * @param samples (sample, y) with y ∈ {−1, +1}
    * @param edges   (sample, feature) binary design matrix (x_ij = 1, as the
    *                reference asserts at adpredictor.cpp:244)
    */
  def train(samples: DataFrame, edges: DataFrame, sweeps: Int = 3,
      beta: Double = 1.0): DataFrame = {
    val e = edges.select(col("sample").cast("long").as("sample"),
      col("feature").cast("long").as("feature")).localCheckpoint(true)
    val y = samples.select(col("sample").cast("long").as("sample"),
      col("y").cast("double").as("y")).localCheckpoint(true)
    var feat = e.select("feature").distinct()
      .select(col("feature"), lit(0.0).as("mu"), lit(1.0).as("sigma2"))
      .localCheckpoint(true)
    for (_ <- 1 to sweeps) {
      // per-sample message: t_i, v(t_i), w(t_i), Σ_i
      val stats = e.join(feat, "feature")
        .groupBy("sample")
        .agg(sum("mu").as("xtmu"),
          (lit(beta * beta) + sum("sigma2")).as("s"))
        .join(y, "sample")
        .withColumn("t", col("y") * col("xtmu") / sqrt(col("s")))
        .withColumn("v", vFun(col("t")))
        .withColumn("w", col("v") * (col("v") + col("t")))
        .select("sample", "y", "s", "v", "w")
      // per-feature aggregated update from the sweep-start prior; the
      // σ-factor term log1p(−σ²_j·w_i/Σ_i) is per-edge but σ²_j is constant
      // within the sweep, so one edges⋈stats⋈σ² join feeds both aggregates
      val upd = e.join(stats, "sample")
        .join(feat.select(col("feature"), col("sigma2").as("sj")), "feature")
        .groupBy("feature")
        .agg(sum(col("y") * col("v") / sqrt(col("s"))).as("a"),
          sum(log1p(-col("sj") * col("w") / col("s"))).as("lf"))
      // rebase, not just checkpoint: feat appears ~3× multiplicatively in
      // this sweep's join tree (see Dataflow.checkpointRebased)
      feat = graft.core.Dataflow.checkpointRebased(
        feat.join(upd, Seq("feature"), "left")
          .select(col("feature"),
            (col("mu") + col("sigma2") * coalesce(col("a"), lit(0.0))).as("mu"),
            (col("sigma2") * exp(coalesce(col("lf"), lit(0.0)))).as("sigma2")))
    }
    feat
  }

  /** Predict labels: sign of Σ_{j∈N(i)} μ_j (adpredictor.cpp:168-171, the
    * validation program's rule). Returns (sample, predict ∈ {−1,+1}).
    */
  def predict(model: DataFrame, edges: DataFrame): DataFrame =
    edges.select(col("sample").cast("long").as("sample"),
      col("feature").cast("long").as("feature"))
      .join(model, "feature")
      .groupBy("sample")
      .agg(when(sum("mu") > 0, 1).otherwise(-1).cast("int").as("predict"))
}

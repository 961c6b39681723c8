package graft.frap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-kernel machinery: label dictionary, dense count arrays, and the
  * three distances of the reference (/root/reference/myapps/helper.cpp:
  * 16-108, profile.cpp:38-79) — symmetric KL divergence with back-off
  * smoothing, Hellinger, Euclidean — plus distributed pairwise distance
  * matrices computed from the *sparse* (graph, label, cnt) form (the dense
  * arrays exist only per-pair inside the aggregation, never materialized at
  * dictionary width × graph count).
  */
object Kernels {

  /** Frozen label dictionary from the learning graphs: (label, label_idx)
    * with dense 0..D-1 indices (insert-order in the reference's singleton
    * map, kernelmaps.cpp:39-49; sorted order here — any fixed bijection
    * leaves all distances unchanged).
    */
  def dictionary(kernelCounts: DataFrame): DataFrame = {
    val spark = kernelCounts.sparkSession
    val labels = kernelCounts.select("label").distinct()
      .orderBy("label")
    val withIdx = labels.rdd.zipWithIndex.map { case (r, i) =>
      (r.getString(0), i)
    }
    spark.createDataFrame(withIdx).toDF("label", "label_idx")
  }

  /** Dense count arrays keyed by graph: (graph_id, counts: Array[Int]) over
    * the dictionary (zeros for absent labels; labels outside the dictionary
    * are dropped — the frozen-map detection semantics).
    */
  def countArrays(kernelCounts: DataFrame, dict: DataFrame,
      dictSize: Int): DataFrame = {
    val joined = kernelCounts.join(dict, "label")
      .groupBy("graph_id")
      .agg(map_from_arrays(
        collect_list(col("label_idx")),
        collect_list(col("cnt"))).as("m"))
    joined.select(col("graph_id"),
      transform(sequence(lit(0), lit(dictSize - 1)),
        i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))
          .cast("int")).as("counts"))
  }

  // ---- driver-side exact ports of the reference distance semantics -------

  /** helper.cpp:16-52 count_distribution: normalize to probabilities; with
    * back-off, zero entries get (min/2)/nZeros and non-zero entries give up
    * (min/2)/nNonZero.
    */
  def countDistribution(counts: Array[Int], backOff: Boolean): Array[Double] = {
    val sum = counts.filter(_ != 0).sum
    val zeroCount = counts.count(_ == 0)
    val distr = counts.map(_ / sum.toDouble)
    val minPos = distr.filter(_ > 0).min
    if (!backOff) distr
    else {
      val backOffP = (minPos / 2) / zeroCount
      val deductP = (minPos / 2) / (counts.length - zeroCount)
      distr.map(v => if (v == 0) backOffP else v - deductP)
    }
  }

  val KullbackLeibler = 0
  val Hellinger = 1
  val Euclidean = 2

  /** helper.cpp:73-108 calculate_distance2. */
  def distance(method: Int, a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length)
    method match {
      case KullbackLeibler =>
        val p = countDistribution(a, backOff = true)
        val q = countDistribution(b, backOff = true)
        p.indices.map(i => (p(i) - q(i)) * math.log(p(i) / q(i))).sum
      case Hellinger =>
        val p = countDistribution(a, backOff = false)
        val q = countDistribution(b, backOff = false)
        math.sqrt(p.indices.map { i =>
          val d = math.sqrt(p(i)) - math.sqrt(q(i)); d * d
        }.sum) / math.sqrt(2)
      case Euclidean =>
        math.sqrt(a.indices.map { i =>
          val d = (a(i) - b(i)).toDouble; d * d
        }.sum)
    }
  }

  /** k-sigma outlier trim over a value column — the reference's legacy
    * normalized-kernel filter (/root/reference/myapps/main.cpp:522-557,
    * vertexlabel_static.cpp:1251-1280): keep rows within mean ± k·stddev.
    */
  def outlierTrim(df: DataFrame, valueCol: String, k: Double = 2.0): DataFrame = {
    val row = df.agg(
      avg(col(valueCol)).as("mu"),
      stddev_pop(col(valueCol)).as("sigma")).head()
    val (mu, sigma) = (row.getDouble(0), row.getDouble(1))
    df.filter(col(valueCol).between(mu - k * sigma, mu + k * sigma))
  }

  /** Distributed pairwise Euclidean distance matrix straight from the sparse
    * counts (no dense arrays): ‖a−b‖² = Σa² + Σb² − 2Σab, the Σab term from
    * a label equi-join. (graph_a < graph_b, dist double.) KL/Hellinger need
    * the dense smoothing and run on collected arrays — graph counts are
    * small even when graphs are huge; the heavy side is the WL relabeling,
    * which is fully distributed.
    */
  /** Distributed pairwise Hellinger distance matrix from sparse counts:
    * with p, q the per-graph count distributions (no back-off — the
    * reference normalizes raw counts for Hellinger, helper.cpp:85-95),
    * dist = sqrt(Σ(√p−√q)²)/√2 = sqrt(1 − Σ√(p·q)); the Bhattacharyya dot
    * needs only the labels present in BOTH graphs — a label equi-join, no
    * dense arrays. (ga < gb, dist double.)
    */
  def hellingerMatrix(kernelCounts: DataFrame): DataFrame = {
    val tot = kernelCounts.groupBy("graph_id").agg(sum("cnt").as("tot"))
    val c = kernelCounts.join(tot, "graph_id")
    val l = c.select(col("graph_id").as("ga"), col("label"),
      col("cnt").as("ca"), col("tot").as("ta"))
    val r = c.select(col("graph_id").as("gb"), col("label"),
      col("cnt").as("cb"), col("tot").as("tb"))
    // Σ(√p−√q)² = Σ_common(√p−√q)² + Σ_only-a p + Σ_only-b q. The only-in-
    // one-graph masses are computed from EXACT integer count sums
    // ((tot−Σ_common cnt)/tot) — the 1−Σp float form leaves a ~1e-16
    // residue that sqrt blows up to 1e-8 on identical graphs.
    val dots = l.join(r, "label").filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(
        sum(pow(sqrt(col("ca").cast("double") / col("ta")) -
          sqrt(col("cb").cast("double") / col("tb")), 2)).as("common_sq"),
        sum("ca").as("cca"), sum("cb").as("ccb"),
        first("ta").as("ta"), first("tb").as("tb"))
    val gs = tot.select(col("graph_id"), col("tot"))
    val pairs = gs.select(col("graph_id").as("ga"), col("tot").as("tota"))
      .crossJoin(gs.select(col("graph_id").as("gb"), col("tot").as("totb")))
      .filter(col("ga") < col("gb"))
    pairs.join(dots, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"),
        (sqrt(
          coalesce(col("common_sq"), lit(0.0)) +
            (col("tota") - coalesce(col("cca"), lit(0L))).cast("double")
              / col("tota") +
            (col("totb") - coalesce(col("ccb"), lit(0L))).cast("double")
              / col("totb")) / math.sqrt(2.0))
          .as("dist"))
  }

  def euclideanMatrix(kernelCounts: DataFrame): DataFrame = {
    val norms = kernelCounts.groupBy("graph_id")
      .agg(sum(col("cnt") * col("cnt")).as("sq"))
    val l = kernelCounts.select(col("graph_id").as("ga"), col("label"),
      col("cnt").as("ca"))
    val r = kernelCounts.select(col("graph_id").as("gb"), col("label"),
      col("cnt").as("cb"))
    val cross = norms.select(col("graph_id").as("ga"), col("sq").as("sqa"))
      .crossJoin(norms.select(col("graph_id").as("gb"), col("sq").as("sqb")))
      .filter(col("ga") < col("gb"))
    val dots = l.join(r, "label").filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(sum(col("ca") * col("cb")).as("dot"))
    cross.join(dots, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"),
        sqrt(col("sqa") + col("sqb") - lit(2.0) * coalesce(col("dot"), lit(0L)))
          .as("dist"))
  }
}

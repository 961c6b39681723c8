package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vectors.Similarity

/** Round-6 A/B probe for the similarity-search hot paths (guide §1):
  * times the SHIPPED `Similarity.bruteForceTopK` / `Similarity.ivfTopK`
  * on a synthetic corpus large enough that the per-row distance work —
  * not fixture fixed cost — dominates. Run at the before/after commits
  * with identical args; results quoted in OPTIMIZATION_r06.md.
  *
  *   dev/run.sh graft.DevVecProbe [n] [centEvery] [dim] [mode]
  *
  * mode: brute | ivf | both (default both). The corpus is materialized
  * (localCheckpoint) before timing so generation cost is excluded.
  */
object DevVecProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val centEvery = if (args.length > 1) args(1).toInt else 1000
    val dim = if (args.length > 2) args(2).toInt else 64
    val mode = if (args.length > 3) args(3) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-vec-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic synthetic embeddings in [-1, 1): hash(vec_id, j).
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(col("id") * lit(dim) + j), lit(2000)).cast("double") -
          lit(1000.0)) / lit(1000.0)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 10).localCheckpoint(true)
    println(s"[vecprobe] n=$n dim=$dim centEvery=$centEvery " +
      s"cells=${n / centEvery} cores=$cpus")

    def timedNoop(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[vecprobe] $name%-16s $sec%9.2f s")
    }

    if (mode == "both" || mode == "brute")
      timedNoop("brute_topk")(Similarity.bruteForceTopK(emb, queries, 5))
    if (mode == "both" || mode == "ivf")
      timedNoop("ivf_topk")(
        Similarity.ivfTopK(emb, queries, 5, centEvery = centEvery))
    if (mode == "lsh")
      timedNoop("lsh_topk")(Similarity.lshTopK(emb, queries, 5))
    if (mode == "neardup")
      timedNoop("neardup")(
        Similarity.nearDupPairs(emb, threshold = 0.4, bits = 12))
    spark.stop()
  }
}

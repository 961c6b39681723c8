package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: k-core decomposition on a parked edge input — total time,
  * rounds to fixpoint, and the per-round changed-vertex collapse.
  * Usage: dev/run.sh graft.DevKcProbe [path] [cores]
  */
object DevKcProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("kc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.read.parquet(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edges.count()
    val t0 = System.nanoTime()
    val res = graft.algos.KCores.coreness(spark, edges)
    val maxCore = res.agg(org.apache.spark.sql.functions.max("coreness"))
      .head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val rounds = graft.algos.KCores.lastRoundChanged.get()
    println(s"[kc-rounds] changed=${rounds.mkString(",")}")
    println(f"[kc] edges=$n rounds=${rounds.size} max_coreness=$maxCore " +
      f"sec=$sec%.1f")
    spark.stop()
  }
}

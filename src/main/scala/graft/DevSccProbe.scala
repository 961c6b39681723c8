package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: SCC on a parked edge input — total time, component stats.
  * Usage: dev/run.sh graft.DevSccProbe [path] [cores] [maxRounds]
  */
object DevSccProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val maxRounds = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("scc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val edges = spark.read.parquet(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edges.count()
    val t0 = System.nanoTime()
    val scc = graft.algos.SCC.run(spark, edges, maxRounds = maxRounds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = scc.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val stats = scc.groupBy("scc").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_scc"), max("sz").as("largest")).head()
    println(f"[scc] edges=$n vertices=$v n_scc=${stats.getLong(0)} " +
      f"largest=${stats.getLong(1)} sec=$sec%.1f")
    spark.stop()
  }
}

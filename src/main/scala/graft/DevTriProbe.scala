package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: triangle throughput on the parked scaling input.
  * Usage: dev/run.sh graft.DevTriProbe [aqe true|false] [path]
  */
object DevTriProbe {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val path = args.lift(1)
      .getOrElse("/dev/shm/graft-scale-edges-4000000")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val e = s.read.parquet(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val t0 = System.nanoTime()
    val tri = graft.algos.TriangleCount.total(s, e).collect()(0).getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[tri] aqe=$aqe edges=$n triangles=$tri sec=$sec%.1f eps=${n / sec}%.0f")
    s.stop()
  }
}

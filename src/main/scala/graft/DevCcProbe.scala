package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: connected components to fixpoint on a parked edge input, with
  * per-superstep wall time and active-frontier counts — the delta
  * iteration's geometric message collapse made visible at scale.
  * Usage: dev/run.sh graft.DevCcProbe [path] [cores]
  */
object DevCcProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("cc-probe")
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
    val store = new graft.engine.LocalStore
    val t0 = System.nanoTime()
    val res = graft.algos.ConnectedComponents.run(spark, edges,
      maxIters = 100, store = store)
    val sec = (System.nanoTime() - t0) / 1e9
    val comps = res.state.select("label").distinct().count()
    store.metrics.foreach { m =>
      println(f"[cc-step] iter=${m.iter} active=${m.active} " +
        f"sec=${m.wallSec}%.2f")
    }
    println(f"[cc] edges=$n supersteps=${res.supersteps} " +
      f"converged=${res.converged} components=$comps sec=$sec%.1f " +
      f"eps_per_superstep=${n.toDouble * res.supersteps / sec}%.0f")
    spark.stop()
  }
}

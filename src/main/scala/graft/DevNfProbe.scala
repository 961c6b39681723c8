package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: HyperBall neighborhood function on a parked edge input —
  * wall time per radius, estimated N(t), and the frontier collapse — plus
  * the exact landmark BFS for the same radii as a cost contrast. The
  * numbers land in BENCH.md ("Neighborhood function at scale").
  * Usage: dev/run.sh graft.DevNfProbe [path] [cores] [logM] [maxT]
  */
object DevNfProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val logM = args.lift(2).map(_.toInt).getOrElse(5)
    val maxT = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("nf-probe")
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

    var t0 = System.nanoTime()
    val nf = graft.algos.Neighborhood.hyperBall(spark, edges, logM, maxT)
      .orderBy("t").collect()
    val hbSec = (System.nanoTime() - t0) / 1e9
    nf.foreach(r => println(f"[hyperball] t=${r.getInt(0)} " +
      f"nf_est=${r.getDouble(1)}%.3e"))
    println(f"[hyperball] edges=$n m=${1 << logM} maxT=$maxT sec=$hbSec%.1f " +
      f"eps_per_superstep=${n.toDouble * maxT / hbSec}%.0f")

    t0 = System.nanoTime()
    val lm = graft.algos.Neighborhood.landmarkBalls(spark, edges,
      graft.core.LinkGraph.vertices(edges)
        .filter(col("id") % 131071 === 0), maxT)
      .groupBy("t").agg(count(lit(1)).as("landmarks"),
        sum("n_reached").as("nf_exact"))
      .orderBy("t").collect()
    val lmSec = (System.nanoTime() - t0) / 1e9
    lm.foreach(r => println(s"[landmark] t=${r.getLong(0)} " +
      s"landmarks=${r.getLong(1)} nf_exact=${r.getLong(2)}"))
    println(f"[landmark] sec=$lmSec%.1f")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: degree-orientation statistics of a parked edge input — max and
  * quantile oriented out-degree (the degeneracy bound the triangle plan's
  * adjacency arrays live under) plus the total intersection work
  * Σ min(|N(a)|,|N(b)|) per edge, which is what triangle eps actually
  * divides. Usage: dev/run.sh graft.DevOrientStats [path]
  */
object DevOrientStats {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val e = s.read.parquet(path).persist(StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val und = graft.algos.TriangleCount.canonicalEdges(e)
    val oriented = graft.algos.TriangleCount.orientByDegree(und)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = oriented.count()
    val odeg = oriented.groupBy("a").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = odeg.agg(max("d").as("max"),
      expr("percentile_approx(d, array(0.5, 0.99, 0.999))").as("q"),
      avg("d").as("avg")).head()
    val work = oriented
      .join(odeg.select(col("a"), col("d").as("da")), Seq("a"))
      .join(odeg.select(col("a").as("b"), col("d").as("db")), Seq("b"), "left")
      .agg(sum(least(col("da"), coalesce(col("db"), lit(0L)))).as("w"))
      .head().getLong(0)
    println(s"[orient] edges=$n canonical=$m max_odeg=${stats.get(0)} " +
      s"q50_99_999=${stats.getSeq[Double](1).mkString(",")} " +
      f"avg_odeg=${stats.getDouble(2)}%.2f intersect_work=$work " +
      f"work_per_edge=${work.toDouble / m}%.2f")
    s.stop()
  }
}

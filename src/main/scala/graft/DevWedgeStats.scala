package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: per-stage timings of the triangle plan on the scaling input. */
object DevWedgeStats {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val e = s.read.parquet("/dev/shm/graft-scale-edges-4000000")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("read")(e.count())
    val und = graft.algos.TriangleCount.canonicalEdges(e)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("canonical")(und.count())
    val oriented = graft.algos.TriangleCount.orientByDegree(und)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("orient")(oriented.count())
    val adj = oriented.groupBy(col("a").as("id"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("adj")(adj.count())
    val withBoth = oriented
      .join(adj.select(col("id").as("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("id").as("b"), col("nbrs").as("nb")), Seq("b"))
    val tri = withBoth.select(col("a"), col("b"),
      explode(array_intersect(col("na"), col("nb"))).as("c"))
    t("intersect+count")(println("tri=" + tri.count()))
    s.stop()
  }
}

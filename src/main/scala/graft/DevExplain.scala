package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: print the physical plan of one PageRank superstep from a
  * checkpointed state — used to audit exchanges/sorts per superstep
  * (shuffle count is the scale currency; see SURVEY.md §4).
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("DEV_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("DEV_BCAST", "10485760"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.core.LinkGraph.edges(spark, "/root/testdata/sf0.01")
    val sh = graft.algos.PageRank.shares(edges).repartition(32, col("src"))
      .sortWithinPartitions("src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count()
    val st1 = graft.core.LinkGraph.vertices(edges).repartition(32, col("id"))
      .select(col("id"), lit(1.0).as("rank"), lit(Double.MaxValue).as("delta"))
      .localCheckpoint(true)
    val sc2 = st1.select(col("id"), col("rank"))
      .join(sh, st1("id") === sh("src"))
    val sums2 = sc2.groupBy(col("dst"))
      .agg(sum(col("rank") * col("share")).as("insum"))
    val prev2 = st1.select(col("id"), col("rank").as("prev"))
    val next2 = prev2.join(sums2, prev2("id") === sums2("dst"), "left")
      .select(prev2("id"),
        (lit(0.15) + lit(0.85) * coalesce(col("insum"), lit(0.0))).as("rank"))
    println("==== SUPERSTEP (from checkpointed state) ====")
    next2.explain("formatted")
    spark.stop()
  }
}

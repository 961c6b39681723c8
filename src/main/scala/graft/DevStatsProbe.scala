package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: localCheckpoint propagates origin sizeInBytes stats into
  * LogicalRDD, so a loop that inner-joins its state k>1 times per round
  * multiplies the estimate's digit count by ~k every round — until the
  * driver pins a core inside BigInteger stats products (observed on the
  * 22 M-edge Louvain run, round 14). A/Bs plain localCheckpoint against
  * Dataflow.checkpointRebased on a 3-reference loop and prints the stats
  * digit count + wall time per round. Not part of the gate.
  */
object DevStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("stats-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loop(name: String, ckpt: DataFrame => DataFrame): Unit = {
      var df = ckpt(spark.range(1000).select(col("id"), col("id").as("v")))
      for (r <- 1 to 8) {
        val t0 = System.nanoTime()
        val a = df.select(col("id"), (col("v") + 1).as("v"))
        val b = a.join(df.withColumnRenamed("v", "w"), Seq("id"))
          .join(a.withColumnRenamed("v", "u"), Seq("id"))
          .join(df.groupBy(col("v")).count().withColumnRenamed("v", "id"),
            Seq("id"), "left")
          .select(col("id"), (col("v") + col("w") + col("u")).as("v"))
        df = ckpt(b)
        val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$name round=$r digits=${sz.toString.length} sec=$sec%.2f")
      }
    }
    loop("plain", _.localCheckpoint(true))
    loop("rebased", graft.core.Dataflow.checkpointRebased(_))
    spark.stop()
  }
}

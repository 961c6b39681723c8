package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: louvain local moving — planted ring-of-cliques sanity by
  * default, or a scale measurement over a parked parquet edge set
  * (`parquet:/dev/shm/graft-scale-edges-...`). GRAFT_LOUVAIN_TRACE prints
  * per-round move counts. Not part of the gate.
  */
object DevLouvainProbe {
  def main(args: Array[String]): Unit = {
    val scaleInput = args.headOption.filter(_.startsWith("parquet:"))
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      if (scaleInput.isDefined) "32" else "8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toInt)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spark"))
      .config("spark.ui.enabled", false)
      .appName("louvain-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    scaleInput match {
      case Some(p) =>
        val raw = spark.read.parquet(p.drop(8))
        // canonical undirected simple graph, unit weights
        val edges = raw
          .select(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .withColumn("w", lit(1L))
        val n = edges.count()
        val nV = edges.select(explode(array(col("src"), col("dst")))
          .as("id")).distinct().count()
        val maxRounds = if (args.length > 1) args(1).toInt else 150
        // scale runs cut the geometric tail at 0.1% of |V| per round —
        // the sequential-Louvain stopping practice
        val comms = graft.algos.Louvain
          .localMoving(edges, maxRounds, minMoved = nV / 1000)
          .groupBy(col("community")).count()
        val (nComm, maxC) = {
          val r = comms.agg(count(lit(1)), max(col("count"))).head()
          (r.getLong(0), r.getLong(1))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"louvain-scale edges=$n communities=$nComm " +
          f"largest=$maxC sec=$sec%.1f edges_per_sec=${n / sec}%.0f")
      case None =>
        val ring = graft.core.Planted.ringOfCliques(spark, nCliques = 24,
          s = 5)
        val got = graft.algos.Louvain.localMoving(ring)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val ok = got == (0L until 120L).map(v => v -> (v / 5) * 5).toMap
        println(s"ring recovered=$ok sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

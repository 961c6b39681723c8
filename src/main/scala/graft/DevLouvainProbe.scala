package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: louvain local moving on the planted ring of cliques, with
  * per-round tracing (GRAFT_LOUVAIN_TRACE). Not part of the gate.
  */
object DevLouvainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("louvain-probe").getOrCreate()
    val t0 = System.nanoTime()
    val ring = graft.core.Planted.ringOfCliques(spark, nCliques = 24, s = 5)
    val got = graft.algos.Louvain.localMoving(ring)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ok = got == (0L until 120L).map(v => v -> (v / 5) * 5).toMap
    println(s"ring recovered=$ok sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: k-truss peel-round count and truss size, on the derived link
  * graph (sizes the gate query's round budget and the unrolled oracle) or,
  * with `parquet:<path>`, on a parked scaling edge table at local[32].
  * Usage: dev/run.sh graft.DevTrussProbe <sfDir|parquet:path> [k]
  */
object DevTrussProbe {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val k = if (args.length > 1) args(1).toInt else 4
    val scaleRun = input.startsWith("parquet:")
    val cores = if (scaleRun) 32 else 8
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges =
      if (scaleRun) spark.read.parquet(input.drop(8))
      else graft.core.LinkGraph.edges(spark, input)
    val mode = if (args.length > 2) args(2) else "both"

    if (mode == "recount" || mode == "both") {
      var rounds = 0
      val t0 = System.nanoTime()
      // replicate kTruss but log per-round sizes
      var cur = graft.algos.TriangleCount.canonicalEdges(edges)
        .localCheckpoint(true)
      var n = cur.count()
      println(s"[recount] round 0: $n canonical edges")
      var done = n == 0L
      while (!done && rounds < 60) {
        val next = graft.algos.Truss.kTrussRound(cur, k)
        val m = next.count()
        rounds += 1
        println(s"[recount] round $rounds: $m edges (removed ${n - m})")
        done = m == n
        cur = next
        n = m
      }
      println(f"[recount] k=$k truss: $n edges, $rounds rounds (incl. " +
        f"fixpoint check), ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    if (mode == "decrement" || mode == "both") {
      val t1 = System.nanoTime()
      val out = graft.algos.Truss.kTrussDecremental(spark, edges, k,
        perRound = (r, cnt, rm) =>
          println(s"[decrement] round $r: $cnt edges ($rm below threshold)"))
      val nd = out.count()
      println(f"[decrement] k=$k truss: $nd edges, " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    spark.stop()
  }
}

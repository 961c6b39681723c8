package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: CSR (RDD zipPartitions, Kryo-registered) vs DataFrame PageRank
  * throughput A/B on a parked edge parquet (defaults to the 4M-file / 22M-edge
  * scaling input). Usage:
  *   dev/run.sh graft.DevCsrAb [edgesPath] [supersteps] [cores]
  * Referenced by BENCH.md's CSR-vs-DF comparison (VERDICT r2 item 5).
  */
object DevCsrAb {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/graft-scale-edges-4000000")
    val steps = args.lift(1).map(_.toInt).getOrElse(10)
    val cores = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("csr-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrator", "graft.plans.GraftKryoRegistrator")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.read.parquet(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edges.count()
    val warmup = 2

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // interleave the two paths to expose both to the same ambient noise;
    // BOTH sides report the MEDIAN of steady-state supersteps with the same
    // warmup count dropped, and the CSR side's one-time buildBlocks cost is
    // excluded the same way the DF side's static share-table build is (it
    // happens inside run() before the timed loop's per-step clocks start)
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    for (rep <- 1 to 2) {
      val store = new graft.engine.LocalStore
      val dfSec = timeIt {
        graft.algos.PageRank.run(spark, edges, tol = -1.0,
          maxIters = steps + warmup, store = store)
      }
      val dfMed = median(store.metrics.drop(warmup).map(_.wallSec))
      var csrRes: graft.plans.CsrPageRank.Result = null
      val csrSec = timeIt {
        csrRes = graft.plans.CsrPageRank.run(spark, edges, tol = -1.0,
          maxIters = steps + warmup)
      }
      val csrMed = median(csrRes.stepSecs.drop(warmup))
      println(f"[csr-ab] rep=$rep edges=$n df_total=$dfSec%.1f " +
        f"df_median_step=$dfMed%.2f df_eps=${n / dfMed}%.0f " +
        f"csr_total=$csrSec%.1f csr_median_step=$csrMed%.2f " +
        f"csr_eps=${n / csrMed}%.0f")
    }
    spark.stop()
  }
}

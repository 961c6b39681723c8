package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Env-gated scale probe for the grid-Lloyd k-means family (lives in
  * src/test so running it never stales the committed BENCH_LARGE.json
  * record — the guard watches src/main only). Generates a deterministic
  * synthetic embedding table (md5-hash uniform floats — same trick as the
  * SRP planes), then times Lloyd iterations and the final assignment scan.
  *
  * Run: SPARK_GRAFT_KMEANS_PROBE=4000000 sbt -batch "testOnly graft.KmeansScaleProbe"
  * (the value is the vector count; skipped as 'canceled' when unset).
  * Results recorded in BENCH.md "Grid-Lloyd k-means at scale".
  */
class KmeansScaleProbe extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  test("grid-Lloyd throughput at scale (env-gated)") {
    val nOpt = sys.env.get("SPARK_GRAFT_KMEANS_PROBE").map(_.toLong)
    assume(nOpt.nonEmpty, "set SPARK_GRAFT_KMEANS_PROBE=<n_vectors> to run")
    val n = nOpt.get
    val dim = 64
    val k = 64
    // deterministic uniform floats in [-0.5, 0.5): byte 0..3 of
    // md5(vec_id:pos) as a 32-bit fraction — reproducible anywhere
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          p => (conv(substring(md5(concat_ws(":", col("id"), p)), 1, 8),
            16, 10).cast("double") / lit(4294967296.0) - lit(0.5))
            .cast("float")).as("embedding"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    info(s"generated $n vectors x $dim dims: ${vecs.count()} rows")

    val q = vecs.select(col("vec_id"),
        graft.vectors.KMeans.quantize(col("embedding"), 1000).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    q.count()

    // the SHIPPED seed + update path (ADVICE r4: an inlined copy here would
    // let KMeans changes silently decouple BENCH.md numbers from the code);
    // only the per-iteration timing lives in the probe
    var cents = graft.vectors.KMeans.seedCentroids(q, k).localCheckpoint(true)
    for (it <- 1 to 3) {
      val t0 = System.nanoTime()
      cents = graft.vectors.KMeans.lloydStep(q, cents).localCheckpoint(true)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"iter $it: $sec%.1f s = ${n / sec}%.0f vec/s = " +
        f"${n.toDouble * k * dim / sec / 1e9}%.2f G cell-dim ops/s " +
        f"(${cents.count()} live cells)")
    }
    val t0 = System.nanoTime()
    val assigned = graft.vectors.KMeans.assignTo(q, cents)
      .agg(count(lit(1)), countDistinct(col("cid"))).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"assignment-only scan: $sec%.1f s = ${n / sec}%.0f vec/s; " +
      s"rows=${assigned.getLong(0)} cells=${assigned.getLong(1)}")
    assert(assigned.getLong(0) == n)
    q.unpersist(false); vecs.unpersist(false)
  }
}

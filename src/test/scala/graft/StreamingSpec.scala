package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  val eventsPath = s"${TestSessions.Sf0001}/events.parquet"
  // file streams require a directory source
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    spark.read.parquet(eventsPath).repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed aggregation equals the batch equivalent") {
    val streamed = EventStream.runOnce(spark, eventsDir,
      EventStream.windowedCounts, "win_counts", outputMode = "complete")
      .select("window_start", "event_type", "n", "sum_value_q4")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    val batch = EventStream.windowedCountsBatch(
      spark.read.parquet(eventsDir))
      .select("window_start", "event_type", "n", "sum_value_q4")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming sessionization equals batch for watermark-closed sessions") {
    val batchDf = EventStream.sessionizeBatch(spark.read.parquet(eventsDir))
    val batch = batchDf
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value_q4")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect().toSet
    // append mode emits a session once the watermark passes its end; the
    // final watermark stops at the stream's max event time, so parity holds
    // exactly for sessions closed by then — the stream's tail stays open
    val maxTs = spark.read.parquet(eventsDir)
      .agg(max(col("ts"))).as[java.sql.Timestamp].head()
    val streamed = EventStream.runOnce(spark, eventsDir,
      df => EventStream.sessionize(df, delay = "0 seconds"),
      "sessions", outputMode = "append")
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value_q4")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect().toSet
    val closed = batch.filter(s => !s._3.after(maxTs))
    assert(streamed == closed, s"streamed ${streamed.size} closed ${closed.size}")
    assert(streamed.nonEmpty && batch.exists(_._4 > 1))
  }

  test("sessionization: gap merge and boundary semantics (hand fixture)") {
    // user 1: events at 0h, 10h, 20h (gaps < 24h → ONE session ending 44h);
    // user 2: events at 0h and exactly 24h — windows TOUCH and Spark merges
    // them: still ONE session (the boundary rule the oracle must mirror);
    // user 3: events 1 second past the gap → TWO sessions
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    val rows = Seq((1L, 0L), (1L, 36000L), (1L, 72000L),
      (2L, 0L), (2L, 86400L), (3L, 0L), (3L, 86401L))
      .zipWithIndex.map { case ((u, s), i) =>
        (i.toLong, java.sql.Timestamp.from(t0.plusSeconds(s)), u, "e", 1.0)
      }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.sessionizeBatch(df)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(got == Map(1L -> Seq(3L), 2L -> Seq(2L), 3L -> Seq(1L, 1L)))
  }

  test("stateful per-user totals equal the batch groupBy") {
    val ds = spark.read.parquet(eventsPath)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val got = EventStream.userTotals(ds)
      .collect().map(s => s.user_id -> ((s.events, math.round(s.total * 1e4))))
      .toMap
    val want = spark.read.parquet(eventsPath)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, math.round(r._3 * 1e4)))).toMap
    assert(got == want)
  }

  test("evolving-graph ingest recomputes per micro-batch, monotonic counts") {
    // several files → several micro-batches (a single file = one batch)
    val dir = eventsDir
    val counts = EventStream.evolvingEdgeIngest(spark, dir,
      df => df.select("user_id").distinct(), "evolve_cc")
    assert(counts.size >= 4)
    assert(counts.nonEmpty)
    assert(counts == counts.sorted, "accumulating table can't shrink")
    val total = spark.read.parquet(dir)
      .select("user_id").distinct().count()
    assert(counts.last == total)
  }

  test("streaming PageRank re-ranks after each ingested batch") {
    // stream the sf0.001 link graph in 4 micro-batches
    val edges = graft.core.LinkGraph.edges(spark, TestSessions.Sf0001)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spr").toString + "/edges"
    edges.repartition(4).write.parquet(dir)
    val perBatch = EventStream.streamingPageRank(spark, dir, k = 10,
      tol = 1e-4)
    assert(perBatch.size == 4)
    assert(perBatch.forall(_.size == 10))
    // final batch covers the whole graph: equals the batch fixpoint top-10
    val full = graft.algos.PageRank
      .run(spark, spark.read.parquet(dir), tol = 1e-4, maxIters = 100)
      .state.orderBy(org.apache.spark.sql.functions.desc("rank"),
        org.apache.spark.sql.functions.asc("id"))
      .limit(10).select("id", "rank")
      .as[(Long, Double)].collect().toSeq
    // same ids in order; ranks allclose (partitioning differs between the
    // accumulated-checkpoint table and a fresh read → 1e-14 sum-order noise)
    assert(perBatch.last.map(_._1) == full.map(_._1))
    perBatch.last.zip(full).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9)
    }
    // the ranking genuinely evolves across batches
    assert(perBatch.map(_.map(_._1)).distinct.size >= 2)
  }

  test("watermark drops late data (not just parity): late row excluded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(events).writeStream
      .outputMode("append").format("memory").queryName("late_drop").start()
    try {
      // batch 0: two rows in [10:00,11:00) plus 13:00 -> watermark becomes
      // 13:00 - 2h = 11:00 after the batch
      ms.addData((t(10, 0), "a", 1.0), (t(10, 30), "a", 1.0),
        (t(13, 0), "a", 1.0))
      q.processAllAvailable()
      // batch 1: a LATE row for the already-closed 10:00 window (behind the
      // 11:00 watermark -> must be dropped), plus 16:00 to advance further
      ms.addData((t(10, 45), "a", 1.0), (t(16, 0), "a", 1.0))
      q.processAllAvailable()
      ms.addData((t(20, 0), "a", 1.0)) // push watermark past all windows
      q.processAllAvailable()
      val out = spark.table("late_drop")
        .select("window_start", "n")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      // the 10:00 window closed with exactly the two on-time rows; the late
      // 10:45 row was discarded by the watermark
      assert(out(t(10, 0)) == 2L,
        s"late row leaked into the closed window: $out")
    } finally q.stop()
  }

  test("streaming ingest dedup: in-watermark dups dropped, state expires") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = ms.toDF().toDF("ts", "doc_id", "text")
    val q = EventStream.dedupIngest(docs, "1 hour").writeStream
      .outputMode("append").format("memory").queryName("dedup_ingest").start()
    try {
      ms.addData((t(10, 0), 1L, "A"), (t(10, 0), 3L, "B"))
      q.processAllAvailable() // both firsts kept
      ms.addData((t(10, 10), 2L, "A"))
      q.processAllAvailable() // in-watermark duplicate of A: dropped
      ms.addData((t(20, 0), 4L, "C"))
      q.processAllAvailable() // watermark -> 19:00; A's state (10:00+1h) evicted
      ms.addData((t(20, 30), 5L, "A"))
      q.processAllAvailable() // same content after expiry: kept again
      val kept = spark.table("dedup_ingest")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 4L, 5L), s"kept=$kept")
    } finally q.stop()
  }

  test("streaming FRAP monitor: per-arrival verdicts equal the batch radius test") {
    import graft.frap.{Frap, FrapPipeline, Kernels, ProvGen, WLRelabel}
    val edges = ProvGen.corpus(spark, nNormal = 8, nAbnormal = 1).cache()
    val learn = (0 until 6).map(i => f"normal-$i%03d")
    val monitor = Seq("normal-006", "normal-007", "bad-000")
    val counts = WLRelabel.kernelCounts(WLRelabel.run(edges, 3)).cache()
    val dict = Kernels.dictionary(
      counts.filter(col("graph_id").isInCollection(learn))).cache()
    val dsize = dict.count().toInt
    val arr = Kernels.countArrays(
      counts.filter(col("graph_id").isInCollection(learn)), dict, dsize)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toArray).toMap
    val profile = Frap.learnProfile(learn.map(arr(_)).toVector)
    // one whole graph per file: each arrives as its own micro-batch
    val dir = java.nio.file.Files.createTempDirectory("graft-prov-stream")
      .toString
    monitor.foreach { g =>
      edges.filter(col("graph_id") === g).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val streamed = FrapPipeline
      .monitorStream(spark, dir, profile, dict, dsize, iters = 3)
      .as[(String, Boolean, Option[Double])].collect()
    // three arrivals → three verdicts, each graph classified exactly once
    assert(streamed.length == 3)
    assert(streamed.map(_._1).toSet == monitor.toSet)
    val batch = FrapPipeline
      .monitorAtScale(spark,
        counts.filter(col("graph_id").isInCollection(monitor)),
        profile, dict, dsize)
      .as[(String, Boolean, Option[Double])].collect()
    assert(streamed.toSet == batch.toSet) // stream ≡ batch, distances included
    val verdicts = streamed.map(v => v._1 -> v._2).toMap
    assert(!verdicts("bad-000"), "planted abnormal graph must be flagged")
    edges.unpersist(false); counts.unpersist(false); dict.unpersist(false)
  }

  test("rate source smoke: continuous micro-batch trigger (non-AvailableNow)") {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "100").load()
      .select(col("value"), (col("value") % 10).as("bucket"))
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("rate_smoke")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("250 milliseconds"))
      .start()
    try {
      // wait until at least one non-empty micro-batch has been committed
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("rate_smoke").isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(200)
      val n = spark.table("rate_smoke").count()
      assert(n > 0, "rate source produced no rows within 30s")
    } finally q.stop()
  }
}

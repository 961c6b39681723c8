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
}

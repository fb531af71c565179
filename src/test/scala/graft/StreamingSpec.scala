package graft

import java.nio.file.{Files, Path}

import graft.streaming.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  def tmp(prefix: String): Path = Files.createTempDirectory(prefix)

  def events = Seq(
    (1L, 100L, "click", 1.0), (2L, 200L, "view", 2.0),
    (3L, 300L, "click", 3.0), (4L, 400L, "view", 4.0))
    .toDF("event_id", "ts_ms", "event_type", "value")

  test("snapshotRun: watermark captured once, re-runs see the same snapshot") {
    val store = new Incremental.WatermarkStore(tmp("wm").toString)
    val run1 = Incremental.snapshotRun(events, $"ts_ms", store, "events", 300L)
    assert(run1.select("event_id").as[Long].collect().toSet == Set(1L, 2L))
    // restart with a later 'now': stored watermark still rules (datacrawler.py:400-408)
    val run2 = Incremental.snapshotRun(events, $"ts_ms", store, "events", 999L)
    assert(run2.select("event_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("incrementalRun: each run sees exactly the delta window") {
    val store = new Incremental.WatermarkStore(tmp("wm2").toString)
    val r1 = Incremental.incrementalRun(events, $"ts_ms", store, "t", 250L)
    assert(r1.select("event_id").as[Long].collect().toSet == Set(1L, 2L))
    val r2 = Incremental.incrementalRun(events, $"ts_ms", store, "t", 500L)
    assert(r2.select("event_id").as[Long].collect().toSet == Set(3L, 4L))
    val r3 = Incremental.incrementalRun(events, $"ts_ms", store, "t", 500L)
    assert(r3.count() == 0)
  }

  test("streaming watermarked window agg over file source + idempotent foreachBatch") {
    val srcDir = tmp("stream-src")
    val outDir = tmp("stream-out")
    val ckpt1 = tmp("stream-ckpt")
    import graft.sources.Tables
    Tables.events(spark, GraftTestSpark.Sf0001)
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema

    val stream = Incremental.readEventsStream(spark, srcDir.toString, schema,
      maxFilesPerTrigger = 2)
    val agg = Incremental.windowedCounts(stream)
    val q = Incremental.startToIdempotentSink(agg, outDir.toString, ckpt1.toString)
    q.awaitTermination(120000)

    val batches = Files.list(outDir).filter(_.getFileName.toString.startsWith("batch-"))
      .filter(p => !p.getFileName.toString.endsWith("._done")).toArray
    assert(batches.nonEmpty)
    val total = spark.read.parquet(
      batches.map(_.toString): _*)
    // windowed counts over all events: totals must match the batch count
    val n = total.agg(sum("n")).head.getLong(0)
    assert(n > 0 && n <= 1000)

    // restart from the same checkpoint: no new batches (offsets committed)
    val q2 = Incremental.startToIdempotentSink(
      Incremental.windowedCounts(
        Incremental.readEventsStream(spark, srcDir.toString, schema, 2)),
      outDir.toString, ckpt1.toString)
    q2.awaitTermination(60000)
    val batches2 = Files.list(outDir).filter(_.getFileName.toString.startsWith("batch-"))
      .filter(p => !p.getFileName.toString.endsWith("._done")).count()
    assert(batches2 == batches.length)
  }
}

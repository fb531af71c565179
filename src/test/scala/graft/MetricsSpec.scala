package graft

import graft.observability.GraftMetrics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's Prometheus counter names must appear, with the observed
  * record counts, after a pipeline action (metrics.py parity). */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  test("Control.abort cancels an in-flight job group (management abort seat)") {
    import graft.observability.Control
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"graft-abort-${System.nanoTime()}"
    val big = spark.range(1L << 34).selectExpr("sum(id * id)") // minutes if not aborted
    val job = Future {
      intercept[Exception] {
        Control.runCancellable(spark, group, "abort test") { big.head() }
      }
    }
    Thread.sleep(1500) // let the job get in flight
    val t0 = System.nanoTime()
    Control.abort(spark, group)
    val ex = Await.result(job, 30.seconds) // cancelled, not run to completion
    assert((System.nanoTime() - t0) / 1e9 < 25.0)
    assert(ex.getMessage != null)
  }

  test("streaming listener: micro-batch progress feeds the same counters") {
    import graft.observability.GraftMetrics
    val qname = s"smetrics-${System.nanoTime()}"
    val m = GraftMetrics.installStreaming(spark, "stream-0", Some(qname))
    val srcDir = java.nio.file.Files.createTempDirectory("smetrics-src")
    val ev = Tables.events(spark, GraftTestSpark.Sf0001).select("event_id", "ts")
    ev.write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.format("noop").queryName(qname)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val deadline = System.currentTimeMillis() + 20000
    while (m.value("processed_records") < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(m.value("processed_records") == ev.count().toDouble)
    assert(m.value("processed_tasks") >= 1.0)
    assert(m.prometheusText.contains("task_processing_latency_sum"))
  }

  test("listener exports reference counter names from the observe bundle") {
    // unique bundle name: suites share the session and run in parallel, so
    // the record counters must only see this test's query
    val bundle = s"graft_metrics_${System.nanoTime()}"
    val m = GraftMetrics.install(spark, "worker-0", bundle)
    val ev = Tables.events(spark, GraftTestSpark.Sf0001)
    val wm = ev.select(max(unix_millis(col("ts")))).head.getLong(0) + 1 // all pass
    val withTs = ev.withColumn("ts_ms_observed", unix_millis(col("ts")))
    val observed = Pipeline.withMetrics(withTs, Some("ts_ms_observed"), Some(wm),
      bundleName = bundle)
    val total = observed.count()
    // the listener bus is async: wait for the record counters to land
    val deadline = System.currentTimeMillis() + 20000
    while (m.value("processed_records") < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(m.value("processed_tasks") >= 1.0)
    assert(m.value("processed_records") == total.toDouble)
    assert(m.value("task_processing_latency_count") >= 1.0)
    val text = m.prometheusText
    Seq("processed_records", "ignored_records", "processed_tasks",
        "task_processing_latency_sum", "start_time").foreach { name =>
      assert(text.contains(name + "{instance=\"worker-0\"}"), text)
    }
  }
}

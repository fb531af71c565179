package graft

import graft.observability.GraftMetrics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's Prometheus counter names must appear, with the observed
  * record counts, after a pipeline action (metrics.py parity). */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

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

package graft.tools

import graft.queries.Catalog
import org.apache.spark.sql.SparkSession

/** Catalog-wide audit for the InferFiltersFromGenerate trap (see
  * SCALING.md round-10): prints every query whose OPTIMIZED plan carries
  * a Filter evaluating a higher-order function or hash expression —
  * i.e. a non-trivially-computed array/expression re-evaluated per row
  * inside a filter, usually an optimizer-synthesized generate guard
  * that predicate pushdown inlined. */
object FilterAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.catalyst.expressions.{HigherOrderFunction, Md5}
    Catalog.all.foreach { d =>
      try {
        val plan = d.fn(spark, sfDir).queryExecution.optimizedPlan
        val bad = plan.collect { case f: LFilter =>
          val heavy = f.condition.collect {
            case h: HigherOrderFunction => h
            case m: Md5 => m
          }
          (f, heavy.size)
        }.filter(_._2 > 0)
        if (bad.nonEmpty)
          println(s"AUDIT ${d.name}: ${bad.size} filter(s) with " +
            s"${bad.map(_._2).sum} heavy expr(s)")
      } catch { case e: Throwable =>
        println(s"AUDIT ${d.name}: ERROR ${e.getMessage.take(80)}")
      }
      graft.functions.Caches.sweepOperatorCaches()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

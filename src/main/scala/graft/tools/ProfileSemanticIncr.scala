package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why does semantic_dedup_incremental cost 70 s under the honest
  * materialize action at 10x when count() finishes in 1.3 s? Prints the
  * executed plans of both action shapes and times the pieces. */
object ProfileSemanticIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/tmp/sfx10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def gate() = graft.queries.Catalog
      .queries("semantic_dedup_incremental")(spark, sfDir)
    time("warm count")(println("rows = " + gate().count()))
    time("count")(gate().count())
    val noSort = {
      val df = gate()
      df.queryExecution.analyzed // force
      df
    }
    // pieces: without orderBy (re-derive via dropping the sort by going
    // through the logical plan is awkward — instead time the hash action
    // on the full gate, then on a limit-less sorted projection)
    val honest = {
      val df = gate()
      df.select(xxhash64(df.columns.map(df.col): _*).as("h"))
        .agg(bit_xor(col("h")))
    }
    def idsHash() = {
      val df = gate().select(col("id_new"), col("id_corpus"))
      df.select(xxhash64(df.columns.map(df.col): _*).as("h"))
        .agg(bit_xor(col("h")))
    }
    time("count codegen=on")(gate().groupBy().count().head())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("count codegen=OFF")(gate().groupBy().count().head())
    time("ids-hash codegen=OFF")(idsHash().head())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("ids-hash codegen=on")(idsHash().head())
    // and: is it the aggregate in the same stage as the join? collect
    // instead of agg
    time("ids-only collect codegen=on")(
      println(gate().select(col("id_new")).count() -> "via count") )
    spark.stop()
  }
}

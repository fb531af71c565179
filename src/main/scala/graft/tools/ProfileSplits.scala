package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-parallelism check: partition counts and q1 timing vs split size. */
object ProfileSplits {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    for (split <- Seq("134217728", "4194304", "1048576")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", split)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName(s"split-$split").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val li = Tables.lineitem(spark, sfDir)
      li.count()
      println(s"PROF split=$split partitions=${li.rdd.getNumPartitions}")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
      graft.SparkEntry.queries("q6_filter_agg")(spark, sfDir).count()
      println(f"PROF split=$split q1+q6 ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
    }
  }
}

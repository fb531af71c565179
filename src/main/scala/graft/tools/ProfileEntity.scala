package graft.tools

import graft.functions.Entity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prefix-filter effectiveness for the entity-resolution join: candidate
  * counts and wall time at a LOW threshold over raw names (prefix keeps
  * 12/16 grams — weak) vs a HIGH threshold over normalized keys (prefix
  * keeps 2-3/7 grams — the regime the filter is built for). */
object ProfileEntity {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    println(s"[profile] sides: ${cust.count()} x ${supp.count()}")
    time("raw names, t=0.27 (weak prefix)") {
      val n = Entity.similarNamePairs(cust, "c_custkey", "c_name",
        supp, "s_suppkey", "s_name", k = 3, threshold = 0.27).count()
      println(s"  pairs = $n")
    }
    val custN = cust.withColumn("ckey",
      regexp_replace(col("c_name"), "[^0-9]", ""))
    val suppN = supp.withColumn("skey",
      regexp_replace(col("s_name"), "[^0-9]", ""))
    time("normalized keys, t=0.8 (strong prefix)") {
      val n = Entity.similarNamePairs(custN, "c_custkey", "ckey",
        suppN, "s_suppkey", "skey", k = 3, threshold = 0.8).count()
      println(s"  pairs = $n")
    }
  }
}

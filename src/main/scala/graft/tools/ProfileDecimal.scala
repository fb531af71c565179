package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decimal-vs-scaled-long aggregation cost (dev tool). */
object ProfileDecimal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
    li.count()
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"PROF $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("sum double")(li.agg(sum(col("l_extendedprice"))).collect())
    t("sum decimal")(li.agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).collect())
    t("sum scaled long")(li.agg(
      sum(round(col("l_extendedprice") * 100).cast("long"))).collect())
    t("grouped decimal mult")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))).collect())
    t("grouped scaled-long mult")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))).collect())
    spark.stop()
  }
}

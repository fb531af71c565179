package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the TopKRewrite optimizer rule: the same user-written window
  * top-k (top 3 events per user by value desc) timed with the rule off
  * (sort-based Window + Spark's WindowGroupLimit) and on (two-stage
  * TopKPerKey heap). Run against the 10x corpus for group counts that
  * make the sort-vs-heap difference visible. */
object ProfileTopKRewrite {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val groupCol = args.lift(1).getOrElse("user_id")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s2 = spark.newSession()
    graft.plans.TopKRewrite.enable(s2)
    def q(s: SparkSession) = {
      val w = Window.partitionBy(groupCol)
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(groupCol, "event_id", "rn")
    }
    def t(name: String, s: SparkSession): Long = {
      val t0 = System.nanoTime()
      val n = q(s).count()
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      n
    }
    println(s"events: ${Tables.events(spark, sfDir).count()}")
    t("warmup window", spark)
    val a = t("window form", spark)
    val b = t("rewritten heap", s2)
    val a2 = t("window form (2)", spark)
    val b2 = t("rewritten heap (2)", s2)
    require(a == b && a2 == b2, s"row mismatch $a/$b")
    spark.stop()
  }
}

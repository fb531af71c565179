package graft.tools

import graft.SparkEntry
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the join queries (dev tool). */
object ProfileJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm li")(Tables.lineitem(spark, sfDir).count())
    t("warm ord")(Tables.orders(spark, sfDir).count())
    t("warm cust")(Tables.customer(spark, sfDir).count())
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    t("li scan+dec agg")(li.agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).collect())
    t("li join ord count")(li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    t("q3 run1")(SparkEntry.queries("q3_join")(spark, sfDir).count())
    t("q3 run2")(SparkEntry.queries("q3_join")(spark, sfDir).count())
    t("q5 run2")(SparkEntry.queries("q5_join_agg")(spark, sfDir).count())
    // variants of the li x reduced-orders join strategy
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    def q3variant(tag: String)(join: => org.apache.spark.sql.DataFrame): Unit = {
      val agg = join.groupBy("o_orderkey")
        .agg(sum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
      t(s"q3v $tag a")(agg.count()); t(s"q3v $tag b")(agg.count())
    }
    val ordRed = ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    q3variant("stats-pick") {
      li.join(ordRed, col("l_orderkey") === col("o_orderkey")) }
    q3variant("shuffle-hash") {
      li.join(ordRed.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey")) }
    q3variant("bcast-ordRed") {
      li.join(broadcast(ordRed), col("l_orderkey") === col("o_orderkey")) }
    q3variant("merge") {
      li.join(ordRed.hint("merge"), col("l_orderkey") === col("o_orderkey")) }
    println("PROF join sizes: " + ord.count() + " orders, " + li.count() + " lineitem")
    SparkEntry.queries("q3_join")(spark, sfDir).explain()
    spark.stop()
  }
}

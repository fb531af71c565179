package graft.tools

import graft.functions.{Caches, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence grid for the adaptive clique-collapse threshold
  * (TextAnalysis.CliqueCollapseMinDup = 1.3): synthesizes corpora at a
  * sweep of duplication factors from the sf documents table (extra
  * exact copies of a doc subset) and times the RAW doc-keyed pair plan
  * against the COLLAPSED one (editVerifiedPairs with collapseCliques
  * forced both ways) under the materialize action. The crossover row
  * grid is what SCALING.md cites for the 1.3 constant.
  *
  * usage: runMain graft.tools.ProfileCollapseGrid [sfDir]
  */
object ProfileCollapseGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
      .persist()
    val n = base.count()

    // dup factor f: add copies — fractional via a doc_id%10 subset with
    // one extra copy, integral via full extra copies (ids offset)
    def corpus(extraFullCopies: Int, extraTenths: Int): DataFrame = {
      val full = (1 to extraFullCopies).map(i => base.select(
        (col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
      val part =
        if (extraTenths == 0) Seq.empty
        else Seq(base.filter(pmod(col("doc_id"), lit(10)) < extraTenths)
          .select((col("doc_id") + 90000000L).as("doc_id"), col("text")))
      (Seq(base) ++ full ++ part).reduce(_ unionAll _)
    }
    def sweep(): Unit = {
      Caches.sweepOperatorCaches()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(_.name == null)
        .foreach(_.unpersist(blocking = false))
    }
    def t(df: => DataFrame): Double = {
      sweep()
      val t0 = System.nanoTime()
      val out = df
      out.select(xxhash64(out.columns.map(out.col): _*).as("h"))
        .agg(bit_xor(col("h"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    val grid = Seq(
      ("1.0", 0, 0), ("1.1", 0, 1), ("1.3", 0, 3), ("1.5", 0, 5),
      ("2.0", 1, 0), ("3.0", 2, 0), ("10.0", 9, 0))
    println(s"base docs n=$n")
    grid.foreach { case (label, fullC, tenths) =>
      val c = corpus(fullC, tenths).persist()
      c.count()
      val raw = (1 to 2).map(_ => t(TextAnalysis.editVerifiedPairs(
        c, "doc_id", "text", collapseCliques = Some(false)))).min
      val col2 = (1 to 2).map(_ => t(TextAnalysis.editVerifiedPairs(
        c, "doc_id", "text", collapseCliques = Some(true)))).min
      println(f"GRID dup=$label raw=$raw%.2f collapsed=$col2%.2f ratio=${raw / col2}%.2f")
      c.unpersist(blocking = false)
    }
    spark.stop()
  }
}

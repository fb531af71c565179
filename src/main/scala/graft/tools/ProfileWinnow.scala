package graft.tools

import graft.functions.{Caches, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the round-10 clique collapse in the winnow pair family
  * ([[TextAnalysis.winnowOverlapPairs]] / [[TextAnalysis.editVerifiedPairs]]):
  * times the raw doc-keyed formulation (pre-round-10) against the
  * clique-collapsed one on a given sf dir. Run against the duplicate-heavy
  * 10x corpus (tools.ScaleUp) to see the raw plan's quadratic-in-clique
  * join work vs the collapsed plan's distinct-text-level work; at plain
  * sf0.1 it measures the collapse machinery's constant overhead instead.
  */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    println(s"docs: ${docs.count()}")

    def rawPairs(): DataFrame = {
      val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 3, 4)
        .select(col("doc_id"), col("fp")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fp.select(col("doc_id").as("id_a"), col("fp"))
        .join(fp.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared_fps"))
        .filter(col("n_shared_fps") >= 2)
    }
    def rawEdit(): DataFrame = {
      val pairs = rawPairs()
      pairs
        .join(docs.select(col("doc_id").as("id_a"),
          substring(col("text"), 1, 80).as("_ta")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"),
          substring(col("text"), 1, 80).as("_tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("n_shared_fps"),
          levenshtein(col("_ta"), col("_tb")).cast("long").as("edit_dist"))
    }
    def sweep(): Unit = {
      Caches.sweepOperatorCaches()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // Bench's MATERIALIZE action, not count(): count() lets Catalyst
    // prune the edit_dist projection — the whole Levenshtein DP — out of
    // the edit variants, so a count-based A/B under-reports them (~0.4 s
    // at sf0.1) vs the close bench, which hashes every output column.
    // (The round-10 verdict's "unexplained" close-vs-A/B gap on
    // dedup_edit_verify was exactly this measurement artifact.)
    def t(name: String)(f: => DataFrame): Long = {
      sweep()
      val t0 = System.nanoTime()
      val df = f
      // hash-xor doubles as the parity check (stronger than row count;
      // xor, not sum — summing uniform 64-bit hashes overflows under ANSI)
      val row = df.select(xxhash64(df.columns.map(df.col): _*).as("h"))
        .agg(bit_xor(col("h"))).head()
      val h = if (row.isNullAt(0)) 0L else row.getLong(0)
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s (hash $h)")
      sweep(); h
    }
    // warm the parquet footer/page caches once
    t("warmup raw overlap")(rawPairs())
    val a = t("raw overlap")(rawPairs())
    // forced: the A/B must time the collapsed plan even on corpora the
    // adaptive chooser (round 11) would route to the raw plan
    val b = t("clique overlap")(
      TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        collapseCliques = Some(true)))
    val c = t("raw edit")(rawEdit())
    val d = t("clique edit")(
      TextAnalysis.editVerifiedPairs(docs, "doc_id", "text",
        collapseCliques = Some(true)))
    val e = t("auto edit")(
      TextAnalysis.editVerifiedPairs(docs, "doc_id", "text"))
    require(c == e, s"auto-path hash mismatch: $c/$e")
    require(a == b && c == d, s"hash mismatch: $a/$b $c/$d")
    spark.stop()
  }
}

package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for suffixRanksIncremental: times the merge against the
  * landed build and the equivalent full rebuild on the same union, at a
  * given sf dir. usage: runMain graft.tools.ProfileSaIncr [sfDir] */
object ProfileSaIncr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.debugTiming", "true")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val delta = docs.filter(pmod(col("doc_id"), lit(14)) === 3)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(14)) === 10)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" zzqx")).as("text")))
    // a ~10x smaller delta, same half-dup/half-variant mix: quantifies
    // the fixed index-pass cost vs the delta-proportional part
    val deltaSmall = docs.filter(pmod(col("doc_id"), lit(140)) === 3)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(140)) === 10)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" zzqx")).as("text")))
    val base = time("base build") {
      val b = graft.functions.SuffixArray.suffixRanks(docs, "doc_id", "text")
      b.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet("target/tmp/profile-sa-base")
      spark.read.parquet("target/tmp/profile-sa-base")
    }
    val reps = time("merge sidecar (offline)") {
      graft.functions.SuffixArray.suffixMergeReps(base, docs,
          "doc_id", "text")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet("target/tmp/profile-sa-reps")
      spark.read.parquet("target/tmp/profile-sa-reps")
    }
    (1 to 2).foreach { i =>
      time(s"incremental merge run$i") {
        graft.functions.SuffixArray.suffixRanksIncrementalFrom(
            reps, base, docs, delta, "doc_id", "text")
          .select(xxhash64(col("doc_id"), col("pos"), col("suffix_rank"))
            .as("h"))
          .agg(bit_xor(col("h"))).head()
      }
    }
    time("incremental merge SMALL delta") {
      graft.functions.SuffixArray.suffixRanksIncrementalFrom(
          reps, base, docs, deltaSmall, "doc_id", "text")
        .select(xxhash64(col("doc_id"), col("pos"), col("suffix_rank"))
          .as("h"))
        .agg(bit_xor(col("h"))).head()
    }
    time("full union rebuild") {
      graft.functions.SuffixArray.suffixRanks(
          docs.select("doc_id", "text").unionAll(delta), "doc_id", "text")
        .select(xxhash64(col("doc_id"), col("pos"), col("suffix_rank"))
          .as("h"))
        .agg(bit_xor(col("h"))).head()
    }
    spark.stop()
  }
}

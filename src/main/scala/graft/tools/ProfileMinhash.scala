package graft.tools

import graft.functions.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup count")(docs.count())
    t("shingles explode")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16).count())
    val nc = t("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text", 3, 16).count())
    println(s"PROF candidate pairs = $nc")
    t("full pipeline")(Dedup.minhashDedupPairs(docs, "doc_id", "text").count())
    // simhash stages
    t("simhash sigs a")(Dedup.simhash(docs, "doc_id", "text").count())
    t("simhash sigs b")(Dedup.simhash(docs, "doc_id", "text").count())
    t("simhash pairs a")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    t("simhash pairs b")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    // exact-then-near composition (the duplicate-heavy-corpus defense)
    t("exact then near")(
      Dedup.nearDupPairsAfterExact(docs, "doc_id", "text").count())
    // connected components over exact-dup + near-dup edges
    val edges = Dedup.exactGroups(docs, "text", "doc_id")
      .filter(col("n_dups") > 1)
      .join(docs.select(col("doc_id"), md5(col("text")).as("digest")), "digest")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("keep_id").as("id_a"), col("doc_id").as("id_b"))
    val nCc = t("connected components")(
      Dedup.connectedComponents(docs, "doc_id", edges)
        .filter(col("id") =!= col("cluster_id")).count())
    println(s"PROF cc non-root members = $nCc")
    spark.stop()
  }
}

package graft.tools

import graft.functions.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Measures the SimHash LSH candidate-pair count under the two key schemes
  * (dev tool backing the multi-block decision in [[Dedup.simhashPairs]]):
  *
  *  - `narrow`: maxDist+1 chunks of 64/(maxDist+1) bits (16-bit keys at
  *    maxDist=3) — random collisions scale as ~4·n²/2¹⁷;
  *  - `multiblock`: Manku-style 6 blocks, join on C(6,3)=20 three-block
  *    concatenations (~32-bit keys) — collisions down by ~2¹⁶.
  *
  * Run against a 10× corpus (tools.ScaleUp writes one) to see the narrow
  * scheme's quadratic term dominate while multi-block tracks the true-pair
  * count. Both schemes are exact by pigeonhole; only the junk-candidate
  * volume differs.
  */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup sigs")(Dedup.simhash(docs, "doc_id", "text").count())
    val narrow = t("narrow candidates")(
      Dedup.simhashCandidatesNarrow(docs, "doc_id", "text", 3).count())
    val multi = t("multiblock candidates")(
      Dedup.simhashCandidates(docs, "doc_id", "text", 3).count())
    val truePairs = t("verified pairs")(
      Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    println(s"PROF n_docs=$n narrow_candidates=$narrow " +
      s"multiblock_candidates=$multi true_pairs=$truePairs " +
      f"junk_ratio_narrow=${narrow.toDouble / math.max(truePairs, 1)}%.1f " +
      f"junk_ratio_multi=${multi.toDouble / math.max(truePairs, 1)}%.1f")
    spark.stop()
  }
}

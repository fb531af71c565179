package graft.tools

import graft.functions.Bpe
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Measures batched vs sequential BPE learning (dev tool backing
  * [[Bpe.learnBatched]]'s scale claim): same corpus, same number of
  * merges, wall-clock and effective merges-per-Spark-round for
  * maxBatch ∈ {1 (= sequential), 4, 16, 64}.
  *
  * The claim under test: greedy BPE's per-merge driver round-trip is the
  * scale bottleneck at real vocabulary sizes (32k-50k merges), and
  * strict-dominance-guarded batching removes a ~m× slice of it without
  * changing a single merge. Output rows also report the merge-table hash
  * so identity is visible in the run log, not just in BpeSpec.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val steps = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("text").persist()
    docs.count()

    def hashOf(df: org.apache.spark.sql.DataFrame): Long =
      df.orderBy("step")
        .select(org.apache.spark.sql.functions.xxhash64(
          df.columns.map(df.col): _*).as("h"))
        .agg(org.apache.spark.sql.functions.sum("h")).head.getLong(0)

    // sequential baseline
    val t0 = System.nanoTime()
    val seq = Bpe.learn(docs, "text", steps)
    val seqHash = hashOf(seq)
    val seqT = (System.nanoTime() - t0) / 1e9
    println(f"PROF bpe sequential steps=$steps%d  $seqT%.1f s  (${steps / seqT}%.2f merges/s)  hash=$seqHash%d")

    for (m <- Seq(4, 16, 64)) {
      val t1 = System.nanoTime()
      val bat = Bpe.learnBatched(docs, "text", steps, maxBatch = m)
      val batHash = hashOf(bat)
      val batT = (System.nanoTime() - t1) / 1e9
      val ok = if (batHash == seqHash) "IDENTICAL" else "** MISMATCH **"
      println(f"PROF bpe maxBatch=$m%-3d steps=$steps%d  $batT%.1f s  (${steps / batT}%.2f merges/s)  $ok")
    }
    spark.stop()
  }
}

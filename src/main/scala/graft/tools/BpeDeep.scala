package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured batched-BPE evidence at production step counts (round-8
  * verdict #5): run `Bpe.learnBatched` at steps >= 256 on sf0.1 and
  * record rounds, merges/round, and wall-time vs the sequential learner
  * over the SAME corpus — the number that substantiates the 32k-vocab
  * feasibility claim (job count compresses by the mean batch size; the
  * per-round work is histogram-sized either way). Results land in
  * SCALING.md.
  *
  * usage: runMain graft.tools.BpeDeep [steps] [maxBatch] [sfDir|steep] [skipSeq]
  *
  * `steep` replaces the sf corpus with a deterministic steep-histogram
  * corpus (256 symbol-disjoint two-char words, occurrence counts
  * 1000, 999, ... strictly decreasing): every ranked window drops
  * strictly, so the 1x dominance guard batches at full maxBatch — the
  * round-compression upper bound, with the same bit-parity requirement.
  * The sf corpus is the opposite regime (near-flat tied counts), so the
  * two runs bracket real corpora.
  */
object BpeDeep {
  def main(args: Array[String]): Unit = {
    val steps = args.lift(0).map(_.toInt).getOrElse(256)
    val maxBatch = args.lift(1).map(_.toInt).getOrElse(16)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val skipSeq = args.lift(3).contains("skipSeq")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs =
      if (sfDir == "steep") {
        // word_i = two unique Latin-Extended chars, repeated (1000 - i)
        // times in its own doc — symbol-disjoint pairs, strictly
        // decreasing counts
        (0 until 256).map { i =>
          val w = "" + (0x100 + 2 * i).toChar + (0x100 + 2 * i + 1).toChar
          (Seq.fill(1000 - i)(w)).mkString(" ")
        }.toDF("text")
      } else graft.sources.Tables.documents(spark, sfDir)
    docs.count() // warm the scan

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val t0 = System.nanoTime()
    val batched = graft.functions.Bpe.learnBatched(docs, "text", steps,
      maxBatch, onRound = (_, size) => batchSizes += size)
    val batchedRows = batched.collect()
    val tBatched = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-deep] batched: steps=$steps maxBatch=$maxBatch " +
      f"merges=${batchedRows.length} rounds=${batchSizes.length} " +
      f"mean_batch=${batchedRows.length.toDouble / batchSizes.length}%.2f " +
      f"wall=${tBatched}%.1f s")
    println(s"[bpe-deep] batch sizes: ${batchSizes.mkString(",")}")

    if (!skipSeq) {
      val t1 = System.nanoTime()
      val seq = graft.functions.Bpe.learn(docs, "text", steps).collect()
      val tSeq = (System.nanoTime() - t1) / 1e9
      println(f"[bpe-deep] sequential: merges=${seq.length} " +
        f"rounds=${seq.length} wall=${tSeq}%.1f s " +
        f"speedup=${tSeq / tBatched}%.2fx")
      // bit-parity at depth: the batched list must BE the sequential list
      val same = seq.map(_.toString).sameElements(
        batchedRows.map(_.toString))
      println(s"[bpe-deep] batched == sequential bit-for-bit: $same")
      require(same, "batched merge list diverged from sequential")
    }
    spark.stop()
  }
}

package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for suffixRanksIncremental: times the merge against the
  * landed build and the equivalent full rebuild on the same union, at a
  * given sf dir and an optional DISTINCT-TEXT scale factor.
  *
  * usage: runMain graft.tools.ProfileSaIncr [sfDir] [distinctFactor]
  *
  * distinctFactor > 1 builds a corpus of factor x DISTINCT texts: copy c
  * tags every token with "~c", so copies share no vocabulary. Unlike
  * ScaleUp's exact duplication — where the identical-content clique
  * collapse runs the doubling loop over the SAME distinct texts and the
  * rebuild is artificially flat — every copy here adds real suffix
  * ranks, the rebuild's corpus-sized rounds grow with the corpus, and
  * the merge's delta-proportional claim meets an honest opponent. */
object ProfileSaIncr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length >= 2) args(1).toInt else 1
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
    val mode = org.apache.spark.sql.SaveMode.Overwrite
    val docs0 = Tables.documents(spark, dir).select("doc_id", "text")
    val docs =
      if (factor <= 1) docs0
      else {
        val path = s"target/tmp/profile-sa-distinct-$factor"
        (0 until factor).map { c =>
          val text =
            if (c == 0) col("text")
            else concat_ws(" ", transform(split(col("text"), " "),
              t => concat(t, lit(s"~$c"))))
          docs0.select((col("doc_id") * factor + c).as("doc_id"),
            text.as("text"))
        }.reduce(_ unionAll _).write.mode(mode).parquet(path)
        spark.read.parquet(path)
      }
    println(s"corpus rows=${docs.count()} (factor=$factor)")
    // same half-dup/half-variant crawl mix as the gate, at two sizes:
    // ~14% (mod 14) and ~1.4% (mod 140) of the corpus
    def deltaOf(m: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === 3)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(m)) === 10)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" zzqx")).as("text")))
    val delta = deltaOf(14)
    val deltaSmall = deltaOf(140)
    val base = time("base build (offline)") {
      val b = graft.functions.SuffixArray.suffixRanks(docs, "doc_id", "text")
      b.write.mode(mode).parquet("target/tmp/profile-sa-base")
      spark.read.parquet("target/tmp/profile-sa-base")
    }
    val reps = time("merge sidecar (offline)") {
      graft.functions.SuffixArray.suffixMergeReps(base, docs,
          "doc_id", "text")
        .write.mode(mode).parquet("target/tmp/profile-sa-reps")
      spark.read.parquet("target/tmp/profile-sa-reps")
    }
    def hashOf(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(col("doc_id"), col("pos"), col("suffix_rank"))
        .as("h")).agg(bit_xor(col("h"))).head()
      ()
    }
    // INTERLEAVED A/B passes (round 14): merge and rebuild alternate
    // within one JVM so a load transient hits both sides — the fixed
    // merge-block-then-rebuild-block order let drifting box load land
    // on one side only (measured: the same rebuild 10.7 s in one run,
    // 36.7 s in the next). Report per-pass times AND the min-of-passes
    // pair, the bench harness's own min-of-medians discipline.
    val passes = if (args.length >= 3) args(2).toInt else 3
    val mT = Array.fill(passes)(0.0)
    val rT = Array.fill(passes)(0.0)
    val mTs = Array.fill(passes)(0.0)
    val rTs = Array.fill(passes)(0.0)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (0 until passes).foreach { i =>
      mT(i) = timed(hashOf(
        graft.functions.SuffixArray.suffixRanksIncrementalFrom(
          reps, base, docs, delta, "doc_id", "text")))
      println(f"PROFILE incremental merge 14pct pass$i ${mT(i)}%.2f s")
      rT(i) = timed(hashOf(graft.functions.SuffixArray.suffixRanks(
        docs.unionAll(delta), "doc_id", "text")))
      println(f"PROFILE full union rebuild 14pct pass$i ${rT(i)}%.2f s")
      mTs(i) = timed(hashOf(
        graft.functions.SuffixArray.suffixRanksIncrementalFrom(
          reps, base, docs, deltaSmall, "doc_id", "text")))
      println(f"PROFILE incremental merge 1.4pct pass$i ${mTs(i)}%.2f s")
      // A/B both round-1 forms on the small delta (the adaptive
      // switch's own choice is the default run above)
      spark.conf.set("spark.graft.saIncr.probeRatio", "0")
      val tp = timed(hashOf(
        graft.functions.SuffixArray.suffixRanksIncrementalFrom(
          reps, base, docs, deltaSmall, "doc_id", "text")))
      println(f"PROFILE merge 1.4pct FORCED-probe pass$i $tp%.2f s")
      // force union on BOTH gates (ratio via division can't overflow,
      // and the absolute floor backstops it at any index size)
      spark.conf.set("spark.graft.saIncr.probeRatio",
        Long.MaxValue.toString)
      spark.conf.set("spark.graft.saIncr.probeMinIndex",
        Long.MaxValue.toString)
      val tu = timed(hashOf(
        graft.functions.SuffixArray.suffixRanksIncrementalFrom(
          reps, base, docs, deltaSmall, "doc_id", "text")))
      println(f"PROFILE merge 1.4pct FORCED-union pass$i $tu%.2f s")
      spark.conf.unset("spark.graft.saIncr.probeRatio")
      spark.conf.unset("spark.graft.saIncr.probeMinIndex")
      rTs(i) = timed(hashOf(graft.functions.SuffixArray.suffixRanks(
        docs.unionAll(deltaSmall), "doc_id", "text")))
      println(f"PROFILE full union rebuild 1.4pct pass$i ${rTs(i)}%.2f s")
    }
    println(f"PROFILE BEST merge14=${mT.min}%.2f rebuild14=${rT.min}%.2f " +
      f"ratio=${mT.min / rT.min}%.2f | merge1.4=${mTs.min}%.2f " +
      f"rebuild1.4=${rTs.min}%.2f ratio=${mTs.min / rTs.min}%.2f")
    spark.stop()
  }
}

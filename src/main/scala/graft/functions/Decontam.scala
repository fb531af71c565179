package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-corpus hygiene op: find (and
  * drop) corpus documents that share any k-word n-gram with a benchmark /
  * evaluation set, so eval data never leaks into training data.
  *
  * Scale design: the benchmark side is always tiny relative to the corpus
  * (suites are at most millions of n-grams — megabytes), so its distinct
  * n-gram set is `broadcast()`: the corpus side stays a narrow
  * explode + broadcast hash join, ZERO corpus shuffle. The corpus text never
  * moves; only matched (id, gram) hits reach the (small) aggregation.
  * This is the join-ordering insight that makes decontamination linear at
  * 100 TB — the naive formulation (corpus ⋈ corpus-sized gram table) would
  * shuffle every n-gram of every document.
  *
  * N-grams reuse [[Dedup.shingles]] ([[graft.plans.WordShingles]] — one
  * narrow pass per document). The join key is the shingle STRING, not a
  * hash: with a broadcast build side there is no shuffle-width to save, and
  * string equality cannot false-positive (a 64-bit hash can, and a false
  * positive here silently drops a clean training document).
  */
object Decontam {

  /** Per-document contamination report: documents of `corpus` sharing at
    * least one k-gram with `bench`, with the number of distinct shared
    * k-grams. Documents also present in `bench` (same id) are excluded —
    * the benchmark trivially "contaminates" itself. */
  def overlaps(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), k)).as("gram"))
      .distinct()
    val benchIds = bench.select(col(benchIdCol).as(idCol)).distinct()
    corpus
      .join(benchIds, Seq(idCol), "left_anti")
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Character-level n-gram decontamination — the GPT-3/PaLM-style check
    * (Brown et al. 2020 Appendix C: 13-gram token overlap; char k-grams
    * catch tokenization-insensitive matches): flag corpus docs sharing any
    * long character substring with the benchmark. The corpus side samples
    * gram START POSITIONS at `stride` while the bench side enumerates
    * EVERY position — any shared region of length ≥ k + stride − 1 then
    * contains a sampled corpus gram that exists verbatim in the bench set,
    * so detection is guaranteed above that length while the corpus-side
    * explode (the expensive side — it scales with the 100 TB) is cut by
    * stride×. Bench grams are an eval set — broadcast; the corpus never
    * shuffles. Output: (id, n_shared_chargrams) per flagged doc. */
  def overlapsCharGrams(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int, stride: Int): DataFrame = {
    require(k > 0 && stride > 0)
    def grams(text: Column, step: Int): Column =
      transform(
        sequence(lit(1), greatest(length(text) - (k - 1), lit(1)), lit(step)),
        i => text.substr(i, lit(k)))
    val benchGrams = bench
      .select(explode(grams(col(benchTextCol), 1)).as("gram"))
      .distinct()
    val benchIds = bench.select(col(benchIdCol).as(idCol)).distinct()
    corpus
      .join(benchIds, Seq(idCol), "left_anti")
      .select(col(idCol),
        explode(array_distinct(grams(col(textCol), stride))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_chargrams"))
  }

  /** [[overlaps]] with a Bloom-sketch prefilter — the 100 TB form. The
    * exact broadcast join above ships the benchmark's full distinct-gram
    * STRING set to every executor; at a large eval suite (10^9 grams) that
    * broadcast is tens of GB of strings. A Bloom filter over the same gram
    * set is ~1.2 GB at 1% fpp — an order of magnitude smaller — and drops
    * ~99% of the corpus's exploded (id, gram) stream before it reaches the
    * verify join, so the join (broadcast or, beyond broadcast reach,
    * shuffle) only sees grams that probably hit. The verify join stays
    * EXACT-string, so a Bloom false positive costs a lookup, never a
    * wrongly-flagged document: output is row-identical to [[overlaps]].
    * Bloom filters have no false negatives, so no hit is ever missed.
    *
    * The sketch is built distributed (`stat.bloomFilter` merges per-task
    * sketches — only sketch bytes cross to the driver) and broadcast once.
    * The membership probe is a deserialize-once-per-executor UDF; it sits
    * on the exploded stream AFTER the narrow shingle pass, so everything
    * upstream of it still whole-stage-codegens. */
  def overlapsBloom(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int, expectedGrams: Long = 1000000L, fpp: Double = 0.01,
      maxBroadcastGrams: Long = 50000000L): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), k)).as("gram"))
      .distinct()
    val bloom = benchGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val bloomBc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => bloomBc.value.mightContain(g))
    val benchIds = bench.select(col(benchIdCol).as(idCol)).distinct()
    // the verify side is broadcast only while the gram SET is within
    // broadcast reach — the whole reason the Bloom sketch exists is that
    // beyond ~5·10⁷ distinct grams the string set is tens of GB and must
    // shuffle instead (the sketch still prefilters the stream either way).
    // The decision keys on expectedGrams — the SAME size estimate the
    // sketch is dimensioned by, which the caller must get right anyway —
    // so no extra counting job runs.
    val verifySide =
      if (expectedGrams <= maxBroadcastGrams) broadcast(benchGrams)
      else benchGrams.hint("shuffle_hash")
    corpus
      .join(benchIds, Seq(idCol), "left_anti")
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .filter(mightContain(col("gram")))
      .join(verifySide, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The REVERSE contamination report — per BENCHMARK document: how many
    * corpus documents share at least one k-gram with it, and how many of
    * its distinct grams leak. This is the eval-integrity view ([[overlaps]]
    * is the training-corpus view): a benchmark item contaminated into
    * thousands of training documents is compromised no matter how the
    * corpus is cleaned, and should be dropped from the EVAL instead. Same
    * join shape as [[overlaps]] — bench grams broadcast, corpus side
    * narrow — with the aggregation keyed by the bench id. */
  def benchReport(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int): DataFrame = {
    val benchGrams = bench
      .select(col(benchIdCol).as("bench_id"),
        explode(Dedup.shingles(col(benchTextCol), k)).as("gram"))
      .distinct()
    val benchIds = bench.select(col(benchIdCol).as(idCol)).distinct()
    corpus
      .join(benchIds, Seq(idCol), "left_anti")
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .distinct()
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col(idCol)).as("n_contaminated_docs"),
        countDistinct(col("gram")).as("n_leaked_grams"))
  }

  /** The decontaminated corpus: every document of `corpus` that shares NO
    * k-gram with `bench` (benchmark members themselves are kept — dropping
    * them is a separate policy choice, composable via an id anti-join).
    * One broadcast anti-join against the contaminated-id set; corpus rows
    * never shuffle. */
  def survivors(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int): DataFrame = {
    val hit = overlaps(corpus, idCol, textCol, bench, benchIdCol,
      benchTextCol, k).select(col(idCol))
    corpus.join(broadcast(hit), Seq(idCol), "left_anti")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out in a deterministic order and cut the
  * concatenated token stream into fixed-budget training sequences
  * (concatenate-and-chunk, the standard LLM pre-training layout).
  *
  * Scale design: the running token count is a window cumsum **partitioned by
  * shard** — each shard packs independently and in parallel, which is
  * exactly how a 100 TB corpus is packed in practice (per input shard /
  * source, never as one global ordered stream). A global `Window.orderBy`
  * with no partition key would funnel the corpus through one task; this
  * never does.
  */
object Packing {

  /** Assign each document the id of the sequence holding its first token:
    * `seq_id = floor(tokens_before_this_doc / budget)`, with documents
    * ordered by `idCol` within each `shardCol` group. */
  def assignSequences(df: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id",
        floor(col("cum_before").cast("double") / budget).cast("long"))
  }

  /** Per-sequence packing stats: documents and tokens landing in each
    * (shard, sequence) bin. */
  def packedStats(df: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Int): DataFrame =
    assignSequences(df, idCol, tokensCol, shardCol, budget)
      .groupBy(col(shardCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("n_tokens"))

  /** GLOBAL concatenate-and-chunk layout — the GPT-style pre-training
    * assembly: documents are laid out in one deterministic shuffled stream
    * (seeded-hash order, the [[graft.queries]] corpus_shuffle key) and the
    * stream is cut into fixed `blockWidth`-token training blocks that
    * freely cross document boundaries. Each doc's global token interval
    * [start_off, start_off + n) and its first/last block come from a
    * GLOBAL running sum computed WITHOUT a global window: the order key is
    * a uniform 32-bit hash, so its top `bucketBits` bits partition the
    * order into 2^bucketBits contiguous RANGES — per-bucket token totals
    * (metadata: 2^bucketBits longs to the driver) fold into literal
    * offsets, and each bucket cumsums independently under a PARTITIONED
    * window. Same discipline as `Sampling.budgetTrim` / the scalable page
    * rank, but the bucket bound needs no quantile estimate — the hash is
    * uniform by construction. Integer token counts make the equivalence to
    * the one-pass global window exact. */
  def concatBlocks(df: DataFrame, idCol: String, textCol: String,
      blockWidth: Int, seed: String = "pack42#",
      bucketBits: Int = 8): DataFrame = {
    require(blockWidth > 0 && bucketBits > 0 && bucketBits <= 16,
      "blockWidth > 0; bucketBits in 1..16")
    val n = TextAnalysis.tokenCountWs(col(textCol)).cast("long")
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))),
      25, 8), 16, 10).cast("long")
    val withH = df.select(col(idCol), n.as("n_tokens"), h.as("_h"))
      .withColumn("_bkt", shiftright(col("_h"), 32 - bucketBits).cast("int"))
    val sums = withH.groupBy("_bkt")
      .agg(sum(col("n_tokens")).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBuckets = 1 << bucketBits
    val offsets = (0 until nBuckets).scanLeft(0L) { (acc, b) =>
      acc + sums.getOrElse(b, 0L)
    }.dropRight(1)
    val offExpr = element_at(array(offsets.map(lit): _*), col("_bkt") + lit(1))
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withH
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offExpr)
      .withColumn("block_first",
        expr(s"start_off div ${blockWidth}"))
      .withColumn("block_last",
        expr(s"(start_off + n_tokens - 1) div ${blockWidth}"))
      .select(idCol, "n_tokens", "start_off", "block_first", "block_last")
  }

  /** Length-bucketed batching: group documents of similar token length
    * into fixed-size batches and account the padding each batch pays
    * (`batch_size * max_len - sum_len`) — the pad-efficiency layout for
    * SFT/eval-style batching where sequences are padded to the batch max
    * rather than concatenated. Bucketing by `floor(len / bucketWidth)`
    * bounds within-batch length spread to one bucket width, which is where
    * the pad savings come from (a random batch pays `max_corpus - mean`
    * per row).
    *
    * Scale shape: batches are numbered per (bucket, slice) where slice is
    * a uniform hash slice — the parallelism knob. The row_number window
    * partitions on (bucket, slice), so no task ever sees more than
    * ~N/(buckets*slices) rows; batches never need GLOBAL numbers, only
    * stable in-group ones (deterministic by id order, so the gate
    * recomputes them exactly in SQL). Output: one row per batch with its
    * fill stats. */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int, batchSize: Int, nSlices: Int = 4): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && nSlices > 0)
    val toks = TextAnalysis.tokenCountWs(col(textCol)).cast("long")
    val withB = df.select(col(idCol), toks.as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketWidth"))
      .withColumn("slice",
        pmod(Sampling.hashSlice32(col(idCol)), lit(nSlices.toLong)).cast("int"))
    withB
      .withColumn("batch_id",
        expr(s"(row_number() OVER (PARTITION BY bucket, slice ORDER BY $idCol) - 1) div $batchSize"))
      .groupBy("bucket", "slice", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tok"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("pad_tokens", col("n_docs") * col("max_tok") - col("n_tokens"))
      .select("bucket", "slice", "batch_id", "n_docs", "max_tok", "n_tokens",
        "pad_tokens")
  }

  /** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022 — the
    * code-LM training-data op): deterministically split each document's
    * token stream into prefix|middle|suffix at two seeded-hash cut points
    * and re-emit it in PSM order (prefix, <SUF> suffix, <MID> middle), so
    * an autoregressive model learns infilling. Cuts guarantee a nonempty
    * prefix and middle (suffix may be empty); documents too short to
    * split (< 2 tokens) pass through unchanged with `fim_applied = 0` —
    * the standard FIM-rate carve-out. Entirely narrow per-row expression
    * work (token slicing + hashes): zero shuffle at any scale. The
    * emitted stream hashes (not full text) keep gate rows small; the
    * oracle rebuilds the exact PSM string. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      seed: String = "fim42#"): DataFrame = {
    def h(tag: String): Column =
      conv(substring(md5(concat(lit(seed), lit(tag),
        col(idCol).cast("string"))), 25, 8), 16, 10).cast("long")
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    val canFim = n >= 2
    // cut1 in [1, n-1]: prefix = toks[1..cut1] nonempty, rest nonempty
    val cut1 = when(canFim, pmod(h("|1|"), n - 1) + 1L).otherwise(n)
    // cut2 in [cut1+1, n]: middle = toks[cut1+1..cut2] nonempty
    val cut2 = when(canFim, cut1 + 1L + pmod(h("|2|"), n - cut1)).otherwise(n)
    def joined(from: Column, len: Column): Column =
      array_join(slice(toks, from.cast("int"), len.cast("int")), " ")
    val psm = when(canFim,
      concat(joined(lit(1L), cut1), lit(" <SUF> "),
        joined(cut2 + 1L, n - cut2), lit(" <MID> "),
        joined(cut1 + 1L, cut2 - cut1)))
      .otherwise(col(textCol))
    df.select(col(idCol), n.cast("int").as("n_tokens"),
      canFim.cast("int").as("fim_applied"),
      when(canFim, cut1).otherwise(lit(0L)).cast("int").as("prefix_len"),
      when(canFim, cut2 - cut1).otherwise(lit(0L)).cast("int")
        .as("middle_len"),
      when(canFim, n - cut2).otherwise(lit(0L)).cast("int").as("suffix_len"),
      md5(psm).as("psm_md5"))
  }
}

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
}

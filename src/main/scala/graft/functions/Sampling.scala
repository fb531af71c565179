package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * A 100 TB corpus is mixed, not dumped: each source/language stratum
  * contributes at a configured rate ("mixing weights"). The selection here
  * is a pure hash of the record key — a narrow map with no RNG state, no
  * shuffle, no driver coordination:
  *
  *  - retry-safe and incremental: a task retry or a later re-run over the
  *    same rows keeps exactly the same sample (Bernoulli RNG sampling does
  *    not survive either);
  *  - auditable: membership is recomputable from the key by any engine
  *    (the md5-slice is plain SQL, so the correctness gate verifies the
  *    exact sample, not just its size);
  *  - composable: raising a stratum's rate keeps the previous sample as a
  *    subset (hash thresholds nest), which is how mixing weights are tuned
  *    without resampling the world.
  */
object Sampling {

  /** Uniform 32-bit slice of md5(key) — hex chars 25..32, the same slice
    * [[graft.operators.Partitioners.hashWeightedAssign]] uses. */
  def hashSlice32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 25, 8), 16, 10).cast("long")

  /** Keep-predicate: hash(key) < rate * 2^32, per-stratum rates with a
    * default. Rates are fractions in [0, 1]. */
  def stratifiedKeep(key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    def threshold(r: Double): Long = math.round(r * 4294967296.0)
    val thresholdCol = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(threshold(r))).otherwise(acc)
    }
    hashSlice32(key) < thresholdCol
  }

  /** Stratified deterministic sample of `df`. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    df.filter(stratifiedKeep(col(keyCol), col(strataCol), rates, defaultRate))

  /** Deterministic weighted split assignment (train/val/test and friends):
    * the md5-slice of the key lands uniformly in [0, 2^32) and cumulative
    * weight thresholds partition that range. Pure hash — retry-safe,
    * auditable, stable under re-runs AND under incremental appends (a
    * record's split can never change when new data arrives, which is what
    * keeps eval sets uncontaminated across corpus versions), and
    * SQL-recomputable so the gate verifies exact membership. Weights are
    * normalized; the last split takes the hash-range remainder. */
  def splitAssign(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val h = hashSlice32(key)
    splits.zip(cum).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) =>
        when(h < lit(math.round(c * 4294967296.0)), lit(name)).otherwise(acc)
    }
  }

  /** Exact thresholds [[splitAssign]] uses, for oracle rendering. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    splits.zip(cum).map { case ((n, _), c) => n -> math.round(c * 4294967296.0) }
  }

  /** Exact-k deterministic "reservoir" per stratum: the k records with the
    * smallest hash priority in each stratum (key as tie-break). Same
    * membership as a sequential reservoir under priority sampling, but
    * order-independent and retry-safe — the classic distributed replacement
    * (bottom-k by uniform hash).
    *
    * Two-stage plan, safe for a JUMBO stratum (e.g. one language = half a
    * 100 TB corpus): a PARTIAL bounded-heap pass keeps k rows per stratum
    * per input partition with no exchange (map-side, memory O(k×strata)),
    * then the FINAL clustered pass ranks only the k×numPartitions
    * survivors per stratum. No window partitioned by stratum ever runs, so
    * no stratum's full row set flows through a single task — the shuffle
    * carries samples, not the corpus. Output (membership AND rank) is
    * bit-identical to the one-pass window formulation. */
  def reservoirPerKey(df: DataFrame, keyCol: String, strataCol: String,
      k: Int): DataFrame = {
    val withPrio = df.withColumn("_sample_prio", hashSlice32(col(keyCol)))
    val order = Seq("_sample_prio" -> true, keyCol -> true)
    val pruned = graft.plans.TopKPerKey.perKeyPartial(
      withPrio, Seq(strataCol), order, k)
    graft.plans.TopKPerKey.perKey(pruned, Seq(strataCol), order, k,
        rankName = "sample_rank")
      .drop("_sample_prio")
  }
}

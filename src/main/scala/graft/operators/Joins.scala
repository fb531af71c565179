package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join helpers for the scale paths the built-in planner doesn't pick
  * automatically.
  *
  * The reference has no joins (SURVEY.md §2.4); these exist for the
  * 100 TB engine surface:
  *  - `saltedJoin`: explicit skew mitigation. AQE's skew-join split handles
  *    sort-merge skew at runtime, but a broadcast-infeasible join against a
  *    modest dimension with a few pathological keys (the classic "null/
  *    default key" hot spot) is cheaper pre-salted: the big side gets a
  *    uniform salt in [0, n), the small side is replicated n times, the join
  *    key becomes (key, salt) — hot keys spread over n tasks. The salt only
  *    changes row *placement*, never the join result.
  *  - `coLocatedJoin`: bucketed-write + bucket-join wiring — two tables
  *    pre-bucketed on the join key join with zero shuffle; at 100 TB this is
  *    the difference between moving both tables and moving neither.
  */
object Joins {

  /** Inner equi-join with the big side salted across `saltFactor` sub-keys.
    * Result is identical to `big.join(small, keys, "inner")`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    // uniform, cheap, deterministic-per-task salt; correctness does not
    // depend on which salt a row gets, only that small carries all of them
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Bloom semi-join reduction: prefilter `big` down to rows whose key
    * PROBABLY appears in `small` before the real join runs. This is the
    * scale path where classic semi-reduction stops working: a broadcast
    * semi-join needs the key SET to fit in memory, but a Bloom sketch of
    * 10^9 keys at 1% fpp is ~1.2 GB where the key set is tens of GB — the
    * sketch broadcasts when the keys can't. False positives only cost the
    * join a lookup (the equi-join still verifies exactly); false negatives
    * don't exist, so the result is row-identical to the unreduced join.
    * The sketch builds distributed (`stat.bloomFilter` merges per-task
    * sketches) and the probe is a deserialize-once-per-executor UDF on the
    * scan side — everything upstream whole-stage-codegens. Same discipline
    * as [[graft.functions.Decontam.overlapsBloom]], lifted to joins. */
  def bloomReducedJoin(big: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(key)).distinct()
    val bloom = keys.stat.bloomFilter(key, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    big.filter(mightContain(col(key)))
      .join(small.hint("shuffle_hash"), Seq(key))
  }

  /** As-of join: for each left row, the single latest right row with
    * `rightTs <= leftTs` within the same key — the time-series join Spark
    * has no operator for.
    *
    * Implementation is the scale-correct composition (preference order (a)
    * in the build plan: compose built-ins before custom plans): tag and
    * union both sides, sort once per key by (ts, side), and carry the most
    * recent right payload forward with `last(_, ignoreNulls)` over an
    * unbounded-preceding window. One shuffle + one per-key sort over
    * |L|+|R| rows — never the |L|x|R| range-condition blowup a naive
    * inequality join plans. Right rows at exactly leftTs match (ASOF
    * inclusive semantics: right sorts before left on ties).
    *
    * Right columns come back prefixed `asof_`; unmatched left rows keep
    * them NULL (left-outer semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rightPayloadCols = right.columns.filter(c => c != key && c != rightTs)
    val payload = struct((rightTs +: rightPayloadCols.toSeq).map(col): _*)
    val taggedRight = right
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        payload.as("_rp"))
    val taggedLeft = left
      .withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumn("_rp", lit(null).cast(taggedRight.schema("_rp").dataType))
    val unioned = taggedLeft
      .select((key +: "_ts" +: "_side" +: "_rp" +: left.columns.filter(_ != key).toSeq)
        .distinct.map(col): _*)
      .unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_last_rp", last(col("_rp"), ignoreNulls = true).over(w))
    val outLeftCols = left.columns.toSeq.map(col)
    val outRightCols = (rightTs +: rightPayloadCols.toSeq).map(c =>
      col("_last_rp").getField(c).as(s"asof_$c"))
    carried.filter(col("_side") === 1)
      .select(outLeftCols ++ outRightCols: _*)
  }

  /** Binned range join: every (left, right) pair with the same `key` and
    * `rightTs` in [leftTs, leftTs + window) — WITHOUT the
    * BroadcastNestedLoop/cartesian Spark plans for a raw inequality join.
    *
    * Both timestamps bin at `window` granularity; a right row inside a left
    * row's window lies in the left row's bin or the next one, so the left
    * side explodes into exactly 2 (key, bin) tuples, the join is a plain
    * equi-join on (key, bin), and the exact inequality filters the
    * false-positive half-bin. At 100 TB: shuffle moves each row at most
    * twice, partitioned by (key, bin) — candidate count is bounded by
    * window density, never |L| x |R|. (The manual form of the bin-overlap
    * range-join optimizations published for Spark-family engines.)
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsMillis: String, rightTsMillis: String,
      windowMillis: Long): DataFrame = {
    require(windowMillis > 0, "window must be positive")
    val lBin = floor(col(leftTsMillis) / windowMillis).cast("long")
    val binned = left.withColumn("_bin",
      explode(array(lBin, lBin + lit(1L))))
    val rBinned = right.withColumn("_bin",
      floor(col(rightTsMillis) / windowMillis).cast("long"))
    binned.join(rBinned, Seq(key, "_bin"))
      .filter(col(rightTsMillis) >= col(leftTsMillis) &&
        col(rightTsMillis) < col(leftTsMillis) + lit(windowMillis))
      .drop("_bin")
  }

  /** Write both sides bucketed on the join key, then join the bucketed
    * tables — planned with zero Exchange when bucket counts match. Requires
    * a warehouse-backed table (saveAsTable), which is how co-located joins
    * are declared in Spark. Returns the joined frame read from the tables. */
  def coLocatedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, leftName: String, rightName: String): DataFrame = {
    val spark = left.sparkSession
    // a crashed previous write can leave the managed location behind with no
    // catalog entry -> LOCATION_ALREADY_EXISTS; clear both
    def reset(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = java.nio.file.Paths.get(wh, name)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    reset(leftName); reset(rightName)
    left.write.bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), Seq(key))
  }
}

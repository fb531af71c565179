package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (HyperLogLog, Flajolet et al. 2007)
  * built to be BIT-REPRODUCIBLE by any SQL engine, so the correctness
  * gate can hash-compare estimates, not just shapes.
  *
  * Reference scope: the reference engine has no sketching at all — at its
  * scale (per-table row loops, `wadlabs/hub/migration/datacrawler.py`) exact
  * distinct counts are affordable. At 100 TB they are not: an exact
  * per-source `COUNT(DISTINCT user)` shuffles every distinct key. The HLL
  * sketch shuffles AT MOST m=4096 (bucket, max-rho) longs per group —
  * partial-aggregated map-side — and sub-sketches computed on disjoint
  * slices (days, partitions, ingest batches) MERGE by bucket-wise max
  * without re-reading the data, which is the whole point for incremental
  * 100 TB dashboards.
  *
  * Three determinism decisions make the estimate engine-portable:
  *
  *  1. The hash is the md5-u64 slice (first 16 hex chars of md5), the
  *     repo-wide portable hash family (see [[Dedup.simhashRelational]]):
  *     md5 is computable by any SQL engine, xxhash64 is not.
  *  2. rho (leading-zero rank of the 52 post-bucket bits) is CAPPED at 40,
  *     so a bucket's contribution 2^(40-rho) is an exact BIGINT and the
  *     per-group denominator S = sum(2^(40-rho)) + V*2^40 is an exact,
  *     merge-order-independent integer (max 4096 * 2^40 = 2^52 < 2^63).
  *     P(rho > 40) = 2^-40 — the cap is statistically invisible.
  *  3. The only floating-point step is the final alpha*m^2*2^40 / S with
  *     the operand order pinned; IEEE-754 basic ops are exactly specified,
  *     so Spark and DuckDB produce the identical double. (No ln/pow of
  *     non-2 bases anywhere — libm transcendentals are NOT portable.)
  *
  * The classic small-range LinearCounting correction (m*ln(m/V)) is
  * deliberately NOT applied inside the engine — ln is libm-dependent. The
  * sketch emits V (empty-bucket count) alongside the raw estimate so a
  * consumer that wants the correction can apply it; the raw estimate's
  * error at m=4096 is ~1.6% (1.04/sqrt(m)).
  */
object Sketches {

  /** Bucket-count exponent: m = 2^12 = 4096 buckets = the first 3 md5 hex
    * chars. ~1.6% standard error, 4096 longs max per group sketch. */
  val HllP = 12
  val HllM = 4096
  /** rho cap keeping 2^(RhoCap-rho) an exact integer; P(hit) = 2^-40. */
  val RhoCap = 40

  /** (bucket, rho) for one hashed value. Bucket = first 3 hex chars (12
    * bits); rho = 1 + leading-zero count of the NEXT 40 bits (10 hex
    * chars), capped at [[RhoCap]]. The nibble-level leading-zero walk uses
    * only string ops every engine agrees on. */
  private def bucketAndRho(value: Column): (Column, Column) = {
    val hx = md5(value.cast("string"))
    val bucket = conv(substring(hx, 1, 3), 16, 10).cast("int")
    val tail = substring(hx, 4, 10)
    val z = length(regexp_extract(tail, "^0*", 0))
    // first non-zero hex char (empty string when all 10 are '0')
    val fc = tail.substr(z + lit(1), lit(1))
    val nibbleLz = when(fc.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(fc.isin("4", "5", "6", "7"), 1)
      .when(fc.isin("2", "3"), 2)
      .when(fc === "1", 3)
      .otherwise(0) // z == 10: 4*10 + 0 + 1 = 41, capped below
    val rho = least(z * lit(4) + nibbleLz + lit(1), lit(RhoCap))
    (bucket, rho)
  }

  /** Per-group HLL sketch: (groupCols*, bucket, max_rho). This is the
    * MERGEABLE state — sketches of disjoint slices union and re-max to the
    * sketch of the whole (max is associative/commutative/idempotent).
    * One group-keyed shuffle of <= m rows per group, partial max map-side. */
  def hllSketch(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val (bucket, rho) = bucketAndRho(value)
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("max_rho"))
  }

  /** Merge sub-sketches (same schema as [[hllSketch]] output): bucket-wise
    * max. The 100 TB path: per-day sketches land as tiny tables; the
    * all-time distinct dashboard merges them without touching raw data. */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("max_rho").as("max_rho"))

  /** Raw HLL estimate per group from a sketch frame.
    * Output: (groupCols*, v_empty, s_scaled, hll_est) where
    * s_scaled = sum(2^(40-max_rho)) + v_empty * 2^40 (exact BIGINT) and
    * hll_est = alpha_m * m^2 * 2^40 / s_scaled (IEEE-pinned double). */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String]): DataFrame = {
    val twoP40 = 1L << RhoCap
    sketch
      .groupBy(groupCols.map(col): _*)
      .agg(
        (lit(HllM.toLong) - count(lit(1))).as("v_empty"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - max_rho)"))
          + (lit(HllM.toLong) - count(lit(1))) * lit(twoP40)).as("s_scaled"))
      .withColumn("hll_est",
        // operand order pinned — must match the oracle SQL text exactly;
        // every constant CAST from a string so neither engine parses a
        // DECIMAL literal (decimal division semantics are NOT portable)
        expr(s"(CAST('0.7213' AS DOUBLE) / (CAST(1 AS DOUBLE) " +
          s"+ CAST('1.079' AS DOUBLE) / CAST($HllM AS DOUBLE))) " +
          s"* CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) " +
          s"* CAST($twoP40 AS DOUBLE) / CAST(s_scaled AS DOUBLE)"))
  }

  /** One-call convenience: sketch + estimate. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    hllEstimate(hllSketch(df, groupCols, value), groupCols)

  /** DuckDB CTE chain recomputing the identical sketch + estimate over
    * `table`, grouped by `groupCol`, counting distinct `valueExpr` (a
    * VARCHAR-typed SQL expression). Yields a final SELECT — the oracle. */
  def hllOracleSql(table: String, groupCol: String, valueExpr: String): String = {
    val twoP40 = 1L << RhoCap
    s"""WITH h AS (
       |  SELECT $groupCol, substr(md5($valueExpr), 1, 13) AS hx FROM $table),
       |b AS (
       |  SELECT $groupCol,
       |    CAST(list_reduce(list_transform(
       |      regexp_extract_all(substr(hx, 1, 3), '.'),
       |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |      (a, b) -> a * 16 + b) AS INT) AS bucket,
       |    substr(hx, 4, 10) AS tail
       |  FROM h),
       |r AS (
       |  SELECT $groupCol, bucket,
       |    length(regexp_extract(tail, '^0*')) AS z,
       |    substr(tail, length(regexp_extract(tail, '^0*')) + 1, 1) AS fc
       |  FROM b),
       |rho AS (
       |  SELECT $groupCol, bucket,
       |    LEAST(z * 4 + (CASE
       |      WHEN fc IN ('8','9','a','b','c','d','e','f') THEN 0
       |      WHEN fc IN ('4','5','6','7') THEN 1
       |      WHEN fc IN ('2','3') THEN 2
       |      WHEN fc = '1' THEN 3 ELSE 0 END) + 1, $RhoCap) AS rho
       |  FROM r),
       |sk AS (
       |  SELECT $groupCol, bucket, max(rho) AS max_rho
       |  FROM rho GROUP BY $groupCol, bucket),
       |est AS (
       |  SELECT $groupCol,
       |    CAST($HllM - count(*) AS BIGINT) AS v_empty,
       |    CAST(sum(CAST(1 AS BIGINT) << ($RhoCap - max_rho))
       |         + ($HllM - count(*)) * $twoP40 AS BIGINT) AS s_scaled
       |  FROM sk GROUP BY $groupCol)
       |SELECT $groupCol, v_empty, s_scaled,
       |  (CAST('0.7213' AS DOUBLE) / (CAST(1 AS DOUBLE)
       |     + CAST('1.079' AS DOUBLE) / CAST($HllM AS DOUBLE)))
       |    * CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE)
       |    * CAST($twoP40 AS DOUBLE) / CAST(s_scaled AS DOUBLE) AS hll_est
       |FROM est ORDER BY $groupCol""".stripMargin
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 maintenance — the versioned sibling of
  * the CDC snapshot merge family (`snapshot_merge` is type 1: overwrite in
  * place; SCD2 keeps history): applying a change batch closes the current
  * version of every changed key (`valid_to` = batch ts) and appends a new
  * open version, leaving history and unchanged keys untouched. This is how
  * a dimension table records *when* an attribute changed — the join target
  * for as-of joins over fact history.
  *
  * Plan shape at 100 TB: one id-keyed left join of the CURRENT slice
  * against the (incremental-sized) change batch, null-safe inequality on
  * the tracked attributes to detect real changes, then unions — history
  * rows stream through untouched, nothing ever sorts or windows. The
  * change batch must carry one row per key (dedupe upstream: latest wins). */
object Scd {

  /** `base` columns: `idCol`, `attrCols`..., `valid_from` (long),
    * `valid_to` (long, NULL = current). `changes`: `idCol`, `attrCols`...,
    * `tsCol`. Returns the merged SCD2 table with the same base schema. */
  def scd2Merge(base: DataFrame, changes: DataFrame, idCol: String,
      attrCols: Seq[String], tsCol: String): DataFrame = {
    val outCols = Seq(idCol) ++ attrCols ++ Seq("valid_from", "valid_to")
    val hist = base.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val cur = base.filter(col("valid_to").isNull)
    val chR = changes.select(
      col(idCol) +: (attrCols.map(c => col(c).as(s"_new_$c"))
        :+ col(tsCol).as("_ts")): _*)
    val joined = cur.join(chR, Seq(idCol), "left")
    val changed = attrCols.map(c => !(col(s"_new_$c") <=> col(c)))
      .reduce(_ || _)
    // current version of a changed key: closed at the batch timestamp
    val closed = joined.filter(col("_ts").isNotNull && changed)
      .select(Seq(col(idCol)) ++ attrCols.map(col)
        ++ Seq(col("valid_from"), col("_ts").as("valid_to")): _*)
    // unchanged keys (or keys without a change row) stay open as-is
    val kept = joined.filter(col("_ts").isNull || !changed)
      .select(outCols.map(col): _*)
    // the new open version of every changed key
    val fresh = joined.filter(col("_ts").isNotNull && changed)
      .select(Seq(col(idCol)) ++ attrCols.map(c => col(s"_new_$c").as(c))
        ++ Seq(col("_ts").as("valid_from"),
          lit(null).cast("long").as("valid_to")): _*)
    // keys never seen before: appended open at the batch timestamp
    val brandNew = chR.join(cur.select(col(idCol)), Seq(idCol), "left_anti")
      .select(Seq(col(idCol)) ++ attrCols.map(c => col(s"_new_$c").as(c))
        ++ Seq(col("_ts").as("valid_from"),
          lit(null).cast("long").as("valid_to")): _*)
    hist.unionByName(closed).unionByName(kept).unionByName(fresh)
      .unionByName(brandNew)
  }
}

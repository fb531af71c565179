package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scan-adjacent operators: projection, sort, limit/offset paging, count,
  * and checkpointed-resume page skipping.
  *
  * Reference semantics (all in `/root/reference/wadlabs/hub/migration/`):
  *  - `project_columns`: column list inlined into `SELECT JSON`
  *    (`datacrawler.py:135-137`). Here: `df.select` — Catalyst prunes the
  *    parquet scan to exactly these columns (`ReadSchema` in explain).
  *  - `sort_pushdown`: Solr `"sort"` key (`datacrawler.py:145-146`) → `orderBy`.
  *  - `limit_pages`: stop after `pages` pages ⇒ LIMIT pages*fetch_size
  *    (`datacrawler.py:563-564`).
  *  - `limit_fetch` cursor mode: `LIMIT fetch_size` + `"start": page*fetch_size`
  *    (`datacrawler.py:143,150-151`) ⇒ offset/limit pagination.
  *  - `scan_count`: server-side `SELECT count(*)` (`datacrawler.py:186-200`).
  *  - `scan_resume`: pages already marked DONE in Redis are skipped on restart
  *    (`datacrawler.py:202-209,252-264`). Batch Spark re-runs are
  *    deterministic so resume maps to a page-number predicate over a stable
  *    row ordering.
  *
  * Scale note: `pageNumber` uses a global `row_number()` window only to model
  * the reference's *global* page counter, which is inherently sequential. At
  * 100 TB you would never impose a global order — resume state there is the
  * file/split list (Structured Streaming's FileStreamSource checkpoint), which
  * is what `graft.streaming.Incremental` provides. These operators exist for
  * semantic parity at reference scale and for the oracle harness.
  */
object Scan {

  def projectColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty || cols == Seq("*")) df else df.select(cols.map(col): _*)

  def sortBy(df: DataFrame, keys: Seq[(String, Boolean)]): DataFrame =
    df.orderBy(keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)

  /** limit_pages: cap at pages * fetchSize rows (after any sort). */
  def limitPages(df: DataFrame, pages: Int, fetchSize: Int): DataFrame =
    df.limit(pages * fetchSize)

  /** limit_fetch cursor paging: rows [page*fetchSize, (page+1)*fetchSize). */
  def fetchPage(df: DataFrame, page: Int, fetchSize: Int): DataFrame =
    df.offset(page * fetchSize).limit(fetchSize)

  def count(df: DataFrame): Long = df.count()

  /** Deterministic page number per row given a total order, mirroring the
    * reference's page counter (`datacrawler.py:255`). 0-based.
    */
  def withPageNumber(df: DataFrame, orderCol: String, fetchSize: Int,
      out: String = "page"): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn(out,
      floor((row_number().over(w) - lit(1)) / lit(fetchSize)).cast("long"))
  }

  /** scan_resume: drop rows belonging to pages already completed, and within
    * the first incomplete page drop records at or below the last committed
    * record offset (`worker.py:164-201`).
    */
  def resume(df: DataFrame, orderCol: String, fetchSize: Int,
      donePages: Set[Long], lastRecordOffset: Map[Long, Long] = Map.empty): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    val withRn = df.withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_page", floor((col("_rn") - lit(1)) / lit(fetchSize)))
    val notDone = if (donePages.isEmpty) lit(true)
      else !col("_page").isin(donePages.toSeq: _*)
    val offsetOk = lastRecordOffset.foldLeft(lit(true)) { case (acc, (page, off)) =>
      // offset is the 1-based index-within-page of the last delivered record
      acc && !(col("_page") === lit(page) &&
        (col("_rn") - lit(page * fetchSize)) <= lit(off))
    }
    withRn.filter(notDone && offsetOk).drop("_rn", "_page")
  }
}

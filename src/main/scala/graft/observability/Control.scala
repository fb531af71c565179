package graft.observability

import org.apache.spark.sql.SparkSession

/** The reference's management controls (`management.py:205-285`:
  * pause/resume/abort REST endpoints mutating worker state), re-seated on
  * Spark's own execution controls:
  *
  *  - **abort** -> job-group cancellation: every action run under
  *    [[runCancellable]] is tagged; [[abort]] cancels all its in-flight
  *    jobs from any thread (the REST handler's seat). Tasks stop at the
  *    next interruption point — no partial sink output beyond what the
  *    idempotent batch protocol already tolerates.
  *  - **pause/resume** -> for streaming pipelines, `StreamingQuery.stop()`
  *    and a restart from the same checkpoint IS pause/resume with exact
  *    progress retention (offsets + state live in the checkpoint; proven
  *    by StreamingSpec's restart-adds-nothing tests). Batch re-runs are
  *    deterministic, so "resume" is simply re-running.
  *
  * Nothing here adds runtime cost: the group id is task metadata.
  */
object Control {

  /** Run `body`'s Spark actions under a cancellable job group. */
  def runCancellable[T](spark: SparkSession, groupId: String,
      description: String)(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(groupId, description, interruptOnCancel = true)
    try body
    finally sc.clearJobGroup()
  }

  /** Abort every in-flight job of the group (callable from any thread —
    * the management endpoint's seat). */
  def abort(spark: SparkSession, groupId: String): Unit =
    spark.sparkContext.cancelJobGroup(groupId)
}

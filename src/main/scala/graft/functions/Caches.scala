package graft.functions

import org.apache.spark.sql.DataFrame

/** Cache hygiene for driver-loop operators. */
object Caches {

  /** Tracks the localCheckpoint'd RDDs created THROUGH it, so the release
    * valve frees exactly those — never a concurrent query's blocks. The
    * round-8 form diffed `sparkContext.getPersistentRDDs` around the body,
    * which is process-global: under sbt's parallel suites a CONCURRENT
    * operator's localCheckpoint landing inside the window would be swept
    * too, and because a localCheckpoint severs lineage, the victim fails
    * with missing-block errors instead of recomputing. Scoped tracking
    * removes the race by construction. */
  final class CheckpointScope private[Caches] () {
    private val acquired =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]

    /** Eager localCheckpoint of `df`, remembering the materialized RDD
      * (the `LogicalRDD` leaf the checkpointed frame is built on) for
      * release when the scope closes. Callers must not let the returned
      * frame escape the scope — the blocks are gone after it. */
    def checkpoint(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(true)
      out.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(acquired += _)
      out
    }

    private[Caches] def release(): Unit =
      acquired.foreach(_.unpersist(blocking = false))
  }

  /** Run `body` with a [[CheckpointScope]], then unpersist exactly the
    * RDDs the body checkpointed through it — the release valve for
    * sequential-round operators ([[Bpe.learn]]/`learnBatched`,
    * [[Similarity.mmrSelect]]) whose per-round `localCheckpoint`s would
    * otherwise accumulate one materialized frame per round for the life
    * of the session. ONLY safe when `body` returns driver-local data: a
    * localCheckpoint severs lineage, so a returned DataFrame that still
    * referenced a freed checkpoint could never recompute it. */
  def releasingShortLivedCaches[T](body: CheckpointScope => T): T = {
    val scope = new CheckpointScope
    try body(scope)
    finally scope.release()
  }
}

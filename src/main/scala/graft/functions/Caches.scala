package graft.functions

import org.apache.spark.sql.SparkSession

/** Cache hygiene for driver-loop operators. */
object Caches {

  /** Run `body`, then unpersist every RDD it left persisted (set-diff of
    * `sparkContext.getPersistentRDDs` around the call) — the release valve
    * for sequential-round operators ([[Bpe.learn]]/`learnBatched`,
    * [[Similarity.mmrSelect]]) whose per-round `localCheckpoint`s would
    * otherwise accumulate one materialized frame per round for the life of
    * the session (flagged by the round-7 advisory). ONLY safe when `body`
    * returns driver-local data: a localCheckpoint severs lineage, so a
    * returned DataFrame that still referenced a freed checkpoint could
    * never recompute it. The repo's Verify/Bench run queries sequentially,
    * so the diff cannot claim another query's blocks. */
  def releasingShortLivedCaches[T](spark: SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally {
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }
}

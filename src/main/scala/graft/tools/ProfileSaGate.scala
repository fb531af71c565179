package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the suffix_ranks_incremental GATE shape: reads the
  * PRELANDED base/sidecar parquet (written by [[ProfileSaIncr]] — run it
  * first), replays the gate's mod-14 delta merge once per pass, and
  * prints a per-Spark-job census (submit-to-complete wall, description)
  * so the serial-driver-job bill the round-14 verdict named is visible
  * line by line, not inferred.
  *
  * usage: runMain graft.tools.ProfileSaGate [sfDir] [passes]
  */
object ProfileSaGate {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length >= 2) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.debugTiming", "true")
    // extra args beyond [sfDir] [passes] are session confs "k=v" —
    // e.g. spark.graft.saIncr.localMaxRows=0 for seat A/Bs
    args.drop(2).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"PROFILE conf $k=$v")
    }

    final case class J(id: Int, submitted: Long, var completed: Long,
      desc: String)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
    // per-stage: (tasks, sum executor run ms, sum deserialize ms,
    // sum GC ms, sum result-serialize ms)
    final case class St(id: Int, name: String, var tasks: Int,
      var runMs: Long, var deserMs: Long, var gcMs: Long,
      var schedDelayMs: Long, var submitted: Long, var completed: Long)
    val stages = scala.collection.mutable.LinkedHashMap.empty[Int, St]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.synchronized {
            jobs += J(s.jobId, s.time, -1L,
              Option(s.properties)
                .flatMap(p => Option(p.getProperty(
                  "spark.job.description"))).getOrElse("")
                .take(80))
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.synchronized {
            jobs.find(_.id == e.jobId).foreach(_.completed = e.time)
          }
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = stages.synchronized {
          val i = s.stageInfo
          stages(i.stageId) = St(i.stageId, i.name.take(60), 0, 0, 0, 0,
            0, System.currentTimeMillis(), -1)
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = stages.synchronized {
          stages.get(s.stageInfo.stageId)
            .foreach(_.completed = System.currentTimeMillis())
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          stages.synchronized {
            stages.get(e.stageId).foreach { st =>
              st.tasks += 1
              val m = e.taskMetrics
              if (m != null) {
                st.runMs += m.executorRunTime
                st.deserMs += m.executorDeserializeTime
                st.gcMs += m.jvmGCTime
              }
              if (e.taskInfo != null)
                st.schedDelayMs += math.max(0L,
                  e.taskInfo.launchTime - st.submitted)
            }
          }
      })

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val base = spark.read.parquet("target/tmp/profile-sa-base")
    val reps = spark.read.parquet("target/tmp/profile-sa-reps")
    val delta = docs.filter(pmod(col("doc_id"), lit(14)) === 3)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(14)) === 10)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          concat(col("text"), lit(" zzqx")).as("text")))
    // warm the fixture reads like Bench's warmup does
    docs.count(); base.count(); reps.count(); delta.count()

    def hashOf(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(col("doc_id"), col("pos"), col("suffix_rank"))
        .as("h")).agg(bit_xor(col("h"))).head()
      ()
    }
    (0 until passes).foreach { p =>
      jobs.synchronized(jobs.clear())
      stages.synchronized(stages.clear())
      // Bench's per-query cache hygiene: sweep the operator registry AND
      // every RDD the pass pinned (checkpoint blocks included) so passes
      // don't accumulate heap pressure
      val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      hashOf(graft.functions.SuffixArray.suffixRanksIncrementalFrom(
        reps, base, docs, delta, "doc_id", "text"))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => cachedBefore.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      graft.functions.Caches.sweepOperatorCaches()
      val snap = jobs.synchronized(jobs.toVector)
      val tot = snap.filter(_.completed > 0)
        .map(j => (j.completed - j.submitted) / 1e3).sum
      val ss = stages.synchronized(stages.values.toVector)
      val stageWall = ss.filter(_.completed > 0)
        .map(s => (s.completed - s.submitted) / 1e3).sum
      println(f"PROFILE gate-merge pass$p wall=$wall%.2f s " +
        f"jobs=${snap.size} jobwall=$tot%.2f s " +
        f"stages=${ss.size} stagewall=$stageWall%.2f s " +
        f"taskrun=${ss.map(_.runMs).sum / 1e3}%.2f s " +
        f"deser=${ss.map(_.deserMs).sum / 1e3}%.2f s " +
        f"gc=${ss.map(_.gcMs).sum / 1e3}%.2f s")
      if (p == passes - 1) {
        val base = snap.map(_.submitted).min
        snap.foreach { j =>
          val e = if (j.completed > 0)
            f"${(j.completed - base) / 1e3}%7.2f" else "      ?"
          println(f"  job ${j.id}%4d ${(j.submitted - base) / 1e3}%7.2f ->" +
            f" $e s  ${j.desc}")
        }
        ss.sortBy(s => -s.runMs)
          .take(15).foreach { s =>
            val w = if (s.completed > 0)
              f"${(s.completed - s.submitted) / 1e3}%.3f" else "?"
            println(f"  stage ${s.id}%4d wall=$w%8s tasks=${s.tasks}%3d " +
              f"run=${s.runMs / 1e3}%.2f deser=${s.deserMs / 1e3}%.2f " +
              f"gc=${s.gcMs / 1e3}%.2f | ${s.name}")
          }
      }
    }
    spark.stop()
  }
}

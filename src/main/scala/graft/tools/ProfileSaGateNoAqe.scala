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
object ProfileSaGateNoAqe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length >= 2) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.debugTiming", "true")

    final case class J(id: Int, submitted: Long, var completed: Long,
      desc: String)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
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
      graft.functions.Caches.sweepOperatorCaches()
      val t0 = System.nanoTime()
      hashOf(graft.functions.SuffixArray.suffixRanksIncrementalFrom(
        reps, base, docs, delta, "doc_id", "text"))
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = jobs.synchronized(jobs.toVector)
      val tot = snap.filter(_.completed > 0)
        .map(j => (j.completed - j.submitted) / 1e3).sum
      println(f"PROFILE gate-merge pass$p wall=$wall%.2f s " +
        f"jobs=${snap.size} jobwall=$tot%.2f s")
      snap.foreach { j =>
        val d = if (j.completed > 0)
          f"${(j.completed - j.submitted) / 1e3}%.3f" else "?"
        println(f"  job ${j.id}%4d $d%8s s  ${j.desc}")
      }
    }
    spark.stop()
  }
}

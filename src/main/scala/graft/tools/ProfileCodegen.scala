package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Before/after measurement for the native expressions' codegen paths
  * (dev tool backing the round-8 static-invoke `doGenCode` work on
  * [[graft.plans.WinnowSelect]] / [[graft.plans.SimHash64]] /
  * [[graft.plans.MinHashSig]] / [[graft.plans.WordShingles]] /
  * [[graft.plans.QuantizeInt8]]).
  *
  * "Before" is reproduced by forcing the interpreted evaluator
  * (`spark.sql.codegen.wholeStage=false` +
  * `spark.sql.codegen.factoryMode=NO_CODEGEN`) — the same
  * per-row-boundary regime a CodegenFallback expression imposes on its
  * projection; "after" is the default whole-stage path the expressions now
  * stay inside. Each measurement is a count over a hash of the expression
  * output (nothing collected), median of 3.
  */
object ProfileCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .persist()
    val embs = Tables.embeddings(spark, sfDir).persist()
    docs.count(); embs.count()

    def medianOf3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    def exprs: Seq[(String, () => Unit)] = Seq(
      "simhash64" -> (() => docs.select(
        graft.plans.SimHash64(col("text")).as("h"))
        .agg(sum("h")).count(): Unit),
      "minhash_sig" -> (() => docs.select(
        graft.plans.MinHashSig(col("text"), 3, 16).as("s"))
        .select(element_at(col("s"), 1).as("m")).agg(sum("m")).count(): Unit),
      "word_shingles" -> (() => docs.select(
        graft.plans.WordShingles(col("text"), 3).as("sh"))
        .select(size(col("sh")).as("n")).agg(sum("n")).count(): Unit),
      "winnow_select" -> (() => docs.select(
        graft.plans.WinnowSelect(
          transform(graft.plans.WordShingles(col("text"), 3),
            s => xxhash64(s)), 4).as("f"))
        .select(size(col("f")).as("n")).agg(sum("n")).count(): Unit),
      "quantize_int8" -> (() => embs.select(
        graft.plans.QuantizeInt8(col("embedding")).as("q"))
        .select(col("q.scale")).agg(sum("scale")).count(): Unit))

    for (interpreted <- Seq(true, false)) {
      spark.conf.set("spark.sql.codegen.wholeStage", (!interpreted).toString)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (interpreted) "NO_CODEGEN" else "FALLBACK")
      val mode = if (interpreted) "interpreted" else "codegen"
      exprs.foreach { case (name, f) =>
        f() // warm the path (JIT + codegen compile) outside the timing
        val t = medianOf3(f())
        println(f"PROF $name%-14s $mode%-12s $t%.3f s")
      }
    }
    spark.stop()
  }
}

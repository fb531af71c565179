package graft

import graft.functions.Sampling
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic hash sampling: nesting, rate accuracy, stability. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def keys = spark.range(20000).select($"id".cast("string").as("k"))
    .withColumn("stratum", lit("s"))

  test("hash thresholds nest: raising a rate keeps the old sample as subset") {
    def sample(rate: Double) = Sampling.stratifiedSample(
      keys.toDF(), "k", "stratum", Map.empty, rate)
      .select("k").as[String].collect().toSet
    val s25 = sample(0.25)
    val s50 = sample(0.50)
    assert(s25.subsetOf(s50))
    assert(s25.nonEmpty && s50.size > s25.size)
  }

  test("sample fraction tracks the configured rate (uniform hash)") {
    val n = keys.count().toDouble
    val got = Sampling.stratifiedSample(keys.toDF(), "k", "stratum",
      Map.empty, 0.3).count() / n
    // binomial sd at n=20k, p=0.3 is ~0.0032 -> ±0.02 is >6 sigma
    assert(math.abs(got - 0.3) < 0.02, s"sampled fraction $got")
  }

  test("reservoirPerKey (two-stage bottom-k) matches the one-pass window form exactly") {
    import org.apache.spark.sql.expressions.Window
    // repartition so the PARTIAL stage genuinely prunes across partitions
    val docs = Tables.documents(spark, GraftTestSpark.Sf0001).repartition(8)
    val got = Sampling.reservoirPerKey(docs, "doc_id", "lang", 5)
      .select("lang", "sample_rank", "doc_id")
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy($"lang")
      .orderBy(Sampling.hashSlice32($"doc_id").asc, $"doc_id".asc)
    val want = docs.withColumn("sample_rank", row_number().over(w))
      .filter($"sample_rank" <= 5)
      .select("lang", "sample_rank", "doc_id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("splitAssign: exhaustive, disjoint, ~weighted, append-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = keys.toDF().select($"k",
      Sampling.splitAssign($"k", splits).as("split"))
    val byS = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test")) // exhaustive + disjoint
    val n = 20000.0
    assert(math.abs(byS("train") / n - 0.8) < 0.02)
    assert(math.abs(byS("val") / n - 0.1) < 0.01)
    // append stability: assignment over a subset is the restriction of the
    // assignment over the whole — a record's split never changes
    val subset = keys.toDF().filter($"k".cast("long") < 1000)
      .select($"k", Sampling.splitAssign($"k", splits).as("split"))
      .as[(String, String)].collect().toMap
    val full = assigned.filter($"k".cast("long") < 1000)
      .as[(String, String)].collect().toMap
    assert(subset == full)
  }

  test("per-stratum rates apply to the right strata, deterministically") {
    val docs = Tables.documents(spark, GraftTestSpark.Sf0001)
    val rates = Map("en" -> 1.0, "zh" -> 0.0)
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 0.5)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2) // pure function of the keys
    val byLang = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val allEn = docs.filter($"lang" === "en").count()
    assert(byLang.getOrElse("en", 0L) == allEn) // rate 1.0 keeps everything
    assert(!byLang.contains("zh"))              // rate 0.0 keeps nothing
  }
}

package graft

import graft.functions.{Recipe, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecipeSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // an English-looking doc that passes every Gopher rule: >= 8 tokens,
  // mean token length in [2, 12], low 3-gram repetition, stopwords present
  private def goodText(salt: Int): String =
    s"the and quick brown fox jumps over lazy dog num$salt extra words here"

  test("funnel: monotone per stage, and each count matches a hand-built fixture") {
    // src0: two identical good docs (dedup drops one) + one non-English doc
    // src1: one good doc, one too-short doc
    val docs = Seq(
      (10L, goodText(1), "src0"),
      (11L, goodText(1), "src0"),
      (12L, "el la los las de y en un una que por del", "src0"),
      (13L, goodText(2), "src1"),
      (14L, "tiny doc", "src1"))
      .toDF("doc_id", "text", "source")
    // benchMod=1000 -> only doc_id 0 would be bench; none here, so no
    // contamination. sampleMod=1 -> keep every decontam survivor.
    val out = Recipe.pretrainFunnel(docs, benchMod = 1000L, sampleMod = 1L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val src0 = out(0)
    val src1 = out(1)
    // src0: raw 3, lang 2 (es doc fails), quality 2, dedup 1, decontam 1,
    // sampled 1, tokens = 13
    assert(src0 == (("src0", 3L, 2L, 2L, 1L, 1L, 1L, 13L)))
    // src1: raw 2, lang 2 ("tiny doc" IS classified en — 0 markers all
    // langs, first lang wins), quality 1 (too short), then 1 throughout
    assert(src1 == (("src1", 2L, 2L, 1L, 1L, 1L, 1L, 13L)))
  }

  test("funnel: a bench-contaminated survivor is dropped at the decontam stage") {
    // doc 0 is the bench slice (0 % 20 == 0); doc 21 has a DIFFERENT
    // digest (survives exact dedup) but shares the bench doc's leading
    // 5-grams -> dropped at decontam; doc 23 shares no 5-token window
    // with the bench text and survives
    val docs = Seq(
      (0L, goodText(7), "bench"),
      (21L, goodText(7) + " plus unique trailing tokens", "corpus"),
      (23L, "a small cat sat near the warm window and dreamed of fish", "corpus"))
      .toDF("doc_id", "text", "source")
    val out = Recipe.pretrainFunnel(docs, benchMod = 20L, sampleMod = 1L)
      .filter(col("source") === "corpus")
      .select("n_dedup", "n_decontam").as[(Long, Long)].head()
    assert(out == ((2L, 1L)))
  }

  test("rejectionSamples: one reason per doc, reconciling with the funnel") {
    val docs = Seq(
      (10L, goodText(1), "src0"), // kept
      (11L, goodText(1), "src0"), // duplicate of 10
      (12L, "el la los las de y en un una que por del", "src0"), // lang
      (14L, "tiny doc", "src0")) // quality (lang-id says en, too short)
      .toDF("doc_id", "text", "source")
    val out = Recipe.rejectionSamples(docs, benchMod = 1000L, sampleMod = 1L)
      .as[(String, String, Long, Long)].collect()
      .map(t => t._2 -> (t._3, t._4)).toMap
    assert(out == Map(
      "kept" -> ((1L, 10L)),
      "duplicate" -> ((1L, 11L)),
      "lang" -> ((1L, 12L)),
      // the battery names the exact failing rule ("tiny doc" = 2 words)
      "quality:word_count" -> ((1L, 14L))))
  }

  test("funnel quality stage IS the full Gopher battery: counts reconcile, rejection names the rule") {
    val docs = Seq(
      (1L, goodText(1), "s"),
      // passes every A1 rule (12 words, mean len exactly 3.0, stopwords
      // 'the'+'and') but the repeated "zz zz" 2-gram covers 15 of 47
      // chars (319148 ppm > 200000) -> first A2 coverage failure
      (2L, "the and wolf pack ran far over hill zz zz zz zz", "s"),
      (3L, "tiny doc", "s")) // 2 words -> word_count
      .toDF("doc_id", "text", "source")
    val battery = TextAnalysis.gopherChain(docs, "doc_id", "text",
        minWords = 8, maxWords = 100000)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(battery(1L).isEmpty, battery.toString)
    assert(battery(2L).contains("top_2gram"), battery.toString)
    assert(battery(3L).contains("word_count"), battery.toString)
    // funnel's n_quality equals the battery's survivor count (all en)
    val funnel = Recipe.pretrainFunnel(docs, benchMod = 1000L,
        sampleMod = 1L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(funnel._4 == 1L, funnel.toString)
    // rejection census carries the per-rule loss labels
    val reasons = Recipe.rejectionSamples(docs, benchMod = 1000L,
        sampleMod = 1L)
      .as[(String, String, Long, Long)].collect()
      .map(t => t._2 -> t._4).toMap
    assert(reasons == Map("kept" -> 1L, "quality:top_2gram" -> 2L,
      "quality:word_count" -> 3L), reasons.toString)
  }

  test("funnel: sample gate applies the repo-standard md5-slice predicate") {
    val docs = (0 until 40).map(i =>
      (1000L + i, goodText(i), "s")).toDF("doc_id", "text", "source")
    val out = Recipe.pretrainFunnel(docs, benchMod = 100000L, sampleMod = 2L)
      .select("n_decontam", "n_sampled").as[(Long, Long)].head()
    val expectedSampled = docs.select(col("doc_id"))
      .filter(Sampling.hashSlice32(col("doc_id")) % 2 === 0).count()
    assert(out._1 == 40L)
    assert(out._2 == expectedSampled)
  }
}

package graft

import graft.functions.Classifier
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("linearScore: accept <=> score >= 0; n_features = tokens + bigrams; run-stable") {
    val docs = Tables.documents(spark, GraftTestSpark.Sf0001).limit(200)
    val a = Classifier.linearScore(docs, "doc_id", "text", dim = 64)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val b = Classifier.linearScore(docs, "doc_id", "text", dim = 64)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(a.sameElements(b), "deterministic across runs")
    val nTok = docs.select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    a.foreach { case (id, nf, score, accept) =>
      assert(accept == (score >= 0))
      val t = nTok(id)
      assert(nf == t + math.max(0L, t - 1), s"doc $id features")
    }
  }

  test("linearScore: a custom weight table changes the decision, plumbing intact") {
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val allNeg = Classifier.linearScore(docs, "doc_id", "text", dim = 8,
      weightExpr = _ => lit(-5L))
    allNeg.collect().foreach { r =>
      assert(r.getLong(2) == -5L * r.getLong(1) && !r.getBoolean(3))
    }
    val keep = Classifier.linearScore(docs, "doc_id", "text", dim = 8,
      keep = Seq("text"))
    assert(keep.columns.contains("text"), "passthrough columns survive")
  }

  test("prCurve: confusion counts partition the corpus at every threshold; monotone recall") {
    val docs = Tables.documents(spark, GraftTestSpark.Sf0001)
    val scored = Classifier.linearScore(docs, "doc_id", "text", dim = 64,
        keep = Seq("lang"))
      .withColumn("y", $"lang" === "en")
    val n = scored.count()
    val rows = Classifier.prCurve(scored, "score_micronats", "y",
        Seq(-200000L, 0L, 200000L))
      .orderBy("threshold")
      .select("threshold", "tp", "fp", "fn", "tn", "recall")
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n)
    }
    // raising the threshold can only lose positives -> recall non-increasing
    val recalls = rows.map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => lo >= hi })
  }
}

package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE learner: greedy-merge semantics, pair counting, merge ordering. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def mergeOn(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(syms).toDF("s")
      .select(Bpe.applyMerge(col("s"), a, b).as("m"))
      .as[Seq[String]].head()

  test("applyMerge: greedy leftmost non-overlapping, including a==b runs") {
    assert(mergeOn(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    assert(mergeOn(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // odd run of identical symbols: greedy pairs (1,2), leaves the 3rd
    assert(mergeOn(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeOn(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // a just-merged element never re-merges within the round
    assert(mergeOn(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // no occurrence -> unchanged
    assert(mergeOn(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    // merged symbols participate in LATER rounds as units
    assert(mergeOn(Seq("ab", "c", "a"), "ab", "c") == Seq("abc", "a"))
  }

  test("learn: hand-checkable corpus produces the expected merge sequence") {
    // 'low low low' + 'west' => (l,o) count 3 wins round 1; then (lo,w) 3
    val docs = Seq("low low low", "west").toDF("text")
    val got = Bpe.learn(docs, "text", steps = 2)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L)))
  }

  test("learn: tie-break is (count desc, lhs asc, rhs asc)") {
    // 'ab' and 'cd' both appear twice; (a,b) must win by lhs order
    val docs = Seq("ab cd", "ab cd").toDF("text")
    val got = Bpe.learn(docs, "text", steps = 1)
      .select("lhs", "rhs", "pair_count")
      .as[(String, String, Long)].head()
    assert(got == (("a", "b", 2L)))
  }

  test("learn: overlapping-run pair counting matches the reference convention") {
    // 'aaa': adjacent positions (1,2) and (2,3) BOTH count -> pair_count 2
    val docs = Seq("aaa").toDF("text")
    val got = Bpe.learn(docs, "text", steps = 1)
      .select("lhs", "rhs", "pair_count")
      .as[(String, String, Long)].head()
    assert(got == (("a", "a", 2L)))
  }

  test("segment: applies the learned merges in order") {
    val docs = Seq("low low low", "west").toDF("text")
    val merges = Bpe.learn(docs, "text", steps = 2)
      .orderBy("step").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val seg = Bpe.segment(docs, "text", merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(seg("low") == Seq("low"))
    assert(seg("west") == Seq("w", "e", "s", "t"))
  }
}

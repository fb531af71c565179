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

  test("applyMergeBatch: disjoint pairs in one pass == sequential application") {
    def batchOn(syms: Seq[String], ps: Seq[(String, String)]): Seq[String] =
      Seq(syms).toDF("s")
        .select(Bpe.applyMergeBatch(col("s"), ps).as("m"))
        .as[Seq[String]].head()
    assert(batchOn(Seq("a", "b", "c", "d"), Seq(("a", "b"), ("c", "d")))
      == Seq("ab", "cd"))
    // self-overlapping run inside a batch keeps greedy-leftmost parity
    assert(batchOn(Seq("a", "a", "a", "c", "d"), Seq(("a", "a"), ("c", "d")))
      == Seq("aa", "a", "cd"))
    // adjacent disjoint occurrences don't interfere
    assert(batchOn(Seq("x", "a", "b", "c", "d", "y"), Seq(("a", "b"), ("c", "d")))
      == Seq("x", "ab", "cd", "y"))
  }

  test("learnBatched == learn: bit-identical merge tables, all batch sizes") {
    val corpora = Seq(
      // Zipf-ish: batching fires
      Seq("low low low lower lowest", "west wider wide", "new newer newest"),
      // flat counts + shared symbols everywhere: batch degenerates to ~1
      Seq("ab bc cd de", "ab bc cd de", "ba cb dc ed"),
      // ties on count, tie-break order must survive batching
      Seq("ab cd", "ab cd", "ef gh", "ef gh"))
    for (c <- corpora; mb <- Seq(1, 2, 4, 8)) {
      val docs = c.toDF("text")
      val seqM = Bpe.learn(docs, "text", steps = 6)
        .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
      val batM = Bpe.learnBatched(docs, "text", steps = 6, maxBatch = mb)
        .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
      assert(batM == seqM, s"corpus=$c maxBatch=$mb")
    }
  }

  test("learnBatched: sf0.001 documents corpus matches sequential") {
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    val seqM = Bpe.learn(docs, "text", steps = 8)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    val batM = Bpe.learnBatched(docs, "text", steps = 8, maxBatch = 4)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    assert(batM == seqM)
  }

  test("learnBatched: self-pair merge offspring cannot be skipped " +
    "(round-8 exhausted-universe divergence, regression)") {
    // universe = {(a,a):3, (b,b):1}; merging (a,a) creates (aa,aa):1 which
    // out-tie-breaks (b,b) at sequential step 2 ('aa' < 'b'). The round-8
    // batcher kept both candidates when the fetch exhausted the universe
    // and emitted (b,b) — the self-pair cutoff must stop the batch at (a,a)
    val docs = Seq("aaaa bb").toDF("text")
    val seq = Bpe.learn(docs, "text", 2)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    val bat = Bpe.learnBatched(docs, "text", 2, maxBatch = 4)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    assert(seq == Seq((1, "a", "a", "aa", 3L), (2, "aa", "aa", "aaaa", 1L)))
    assert(bat == seq)
  }

  test("learnBatched: strict 1x dominance batches a steep prefix the old " +
    "3x guard would have serialized, still matching sequential") {
    // disjoint-symbol pairs with strictly dropping counts: (x,y):5,
    // (u,v):3, (s,t):1. steps=2 → boundary = c(s,t) = 1; the 1x guard
    // admits (u,v) (3 > 1) in round 1 where 3x would demand 3 > 3
    val docs = (Seq.fill(5)("xy") ++ Seq.fill(3)("uv") ++ Seq("st"))
      .toDF("text")
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bat = Bpe.learnBatched(docs, "text", 2, maxBatch = 4,
        onRound = (_, size) => rounds += size)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    val seq = Bpe.learn(docs, "text", 2)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    assert(bat == seq)
    assert(seq.map(m => (m._2, m._3, m._5)) ==
      Seq(("x", "y", 5L), ("u", "v", 3L)))
    assert(rounds.toSeq == Seq(2), s"expected one round of 2: $rounds")
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

  test("unigramSegment: Viterbi DP == a plain-JVM replica, tie to longest piece") {
    import graft.functions.Unigram
    val docs = Seq("aba ab aba cab", "dddd aba ab", "xyzw xyzw")
      .toDF("text")
    val out = Unigram.viterbiSegment(docs, "text")
      .orderBy("word")
      .as[(String, Long, Int, Long, String)].collect().toSeq

    // plain-JVM replica of the model and the DP (same quantization,
    // same (score, length)-lexicographic candidate max)
    val freqs = docs.as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      cnt(w.substring(i, i + l)) = cnt.getOrElse(w.substring(i, i + l), 0L) + f
    val t = cnt.values.sum.toDouble
    def s(p: String): Long =
      math.floor(math.log(cnt(p) / t) * 1e6 + 0.5).toLong
    def dp(w: String): (Int, Long, String) = {
      val best = Array.fill(w.length + 1)(0L)
      val ptr = Array.fill(w.length + 1)(0)
      for (i <- 1 to w.length) {
        var top = (Long.MinValue, 0)
        for (l <- 1 to math.min(4, i)) {
          val c = (best(i - l) + s(w.substring(i - l, i)), l)
          if (c._1 > top._1 || (c._1 == top._1 && c._2 > top._2)) top = c
        }
        best(i) = top._1; ptr(i) = top._2
      }
      val ps = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = w.length
      while (pos > 0) { ps.prepend(w.substring(pos - ptr(pos), pos)); pos -= ptr(pos) }
      (ps.length, best(w.length), ps.mkString(" "))
    }
    assert(out.nonEmpty)
    for ((word, freq, nPieces, score, segd) <- out) {
      val (en, esc, eseg) = dp(word)
      assert(freq == freqs(word), word)
      assert((nPieces, score, segd) == ((en, esc, eseg)), s"word=$word")
    }
    // the high-frequency short types segment as single pieces
    val m = out.map(r => r._1 -> r._5).toMap
    assert(m("aba") == "aba" && m("ab") == "ab")
  }

  test("unigram learnSoft: soft-EM lattice marginals == a plain-JVM replica") {
    import graft.functions.Unigram
    val docs = Seq("aba ab aba cab", "dddd aba ab", "xyzw xyzw ab")
      .toDF("text")
    val rounds = 2
    val minCount = 2
    val got = Unigram.learnSoft(docs, "text", maxPieceLen = 4,
        rounds = rounds, minCount = minCount)
      .orderBy("piece")
      .as[(String, Long, Long, Int)].collect().toSeq

    // plain-JVM replica: same per-step micronat quantization of the
    // forward/backward log-sum-exp (candidates in ascending piece-length
    // order), same per-occurrence MICROCOUNT quantization, same prune
    val freqs = docs.as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val seed = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      seed(w.substring(i, i + l)) =
        seed.getOrElse(w.substring(i, i + l), 0L) + f
    val chars = seed.keySet.filter(_.length == 1).toSet
    def scoresOf(v: Map[String, Long]): Map[String, Long] = {
      val t = v.values.sum.toDouble
      v.map { case (p, c) =>
        p -> math.floor(math.log(c / t) * 1e6 + 0.5).toLong }
    }
    def lse(cs: Seq[Long]): Long = {
      val mx = cs.max
      val se = cs.foldLeft(0.0)((a, c) => a + math.exp((c - mx) / 1e6))
      math.floor(mx + math.log(se) * 1e6 + 0.5).toLong
    }
    def softRound(v: Map[String, Long]): Map[String, Long] = {
      val s = scoresOf(v)
      val exp = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- freqs) {
        val n = w.length
        val a = Array.fill(n + 1)(0L)
        for (i <- 1 to n) {
          val cs = (1 to math.min(4, i)).flatMap { l =>
            s.get(w.substring(i - l, i)).map(a(i - l) + _) }
          a(i) = lse(cs)
        }
        val b = Array.fill(n + 2)(0L)
        for (i <- n to 1 by -1) {
          val cs = (1 to math.min(4, n - i + 1)).flatMap { l =>
            s.get(w.substring(i - 1, i - 1 + l)).map(_ + b(i + l)) }
          b(i) = lse(cs)
        }
        for (i <- 1 to n; l <- 1 to math.min(4, n - i + 1);
             sc <- s.get(w.substring(i - 1, i - 1 + l))) {
          val e = math.exp((a(i - 1) + sc + b(i + l) - a(n)) / 1e6)
          val eq = math.floor(e * 1e6 + 0.5).toLong
          val p = w.substring(i - 1, i - 1 + l)
          exp(p) = exp.getOrElse(p, 0L) + eq * f
        }
      }
      chars.map(c => c -> math.max(exp.getOrElse(c, 0L), 1000000L)).toMap ++
        exp.filter { case (p, c) =>
          p.length > 1 && c >= minCount * 1000000L }
    }
    var v: Map[String, Long] = seed.toMap
    (1 to rounds).foreach(_ => v = softRound(v))
    val sFin = scoresOf(v)
    val want = v.toSeq.sortBy(_._1).map { case (p, c) =>
      (p, c, sFin(p), p.length) }
    assert(got == want, s"got=${got.take(8)} want=${want.take(8)}")

    // divergence census vs the hard-EM twin: same scaffolding, so the
    // single-character floor holds in both; the piece inventories may
    // legitimately differ (marginals keep pieces Viterbi starves)
    val hard = Unigram.learn(docs, "text", maxPieceLen = 4,
        rounds = rounds, minCount = minCount)
      .select("piece").as[String].collect().toSet
    val soft = got.map(_._1).toSet
    assert(chars.subsetOf(soft) && chars.subsetOf(hard))
    info(s"vocab sizes: soft=${soft.size} hard=${hard.size} " +
      s"soft-only=${(soft -- hard).size} hard-only=${(hard -- soft).size}")
  }

  test("unigram segmentSoft: decode under the soft vocab == plain-JVM Viterbi over that vocab") {
    import graft.functions.Unigram
    val docs = Seq("aba ab aba cab", "dddd aba ab", "xyzw xyzw ab")
      .toDF("text")
    // the soft-learning itself is pinned by the replica test above; this
    // test pins the DECODE under the vocabulary it produces — the
    // engine's own learnSoft output is the model
    val scores = Unigram.learnSoft(docs, "text")
      .select("piece", "score_micronats")
      .as[(String, Long)].collect().toMap
    val got = Unigram.segmentSoft(docs, "text")
      .orderBy("word")
      .as[(String, Long, Int, Long, String)].collect().toSeq
    val freqs = docs.as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // plain-JVM Viterbi with a PARTIAL vocabulary (pruned multi-char
    // pieces contribute no candidate), ties to the longest last piece
    def dp(w: String): (Int, Long, String) = {
      val best = Array.fill(w.length + 1)(Option.empty[Long])
      best(0) = Some(0L)
      val ptr = Array.fill(w.length + 1)(1)
      for (i <- 1 to w.length) {
        var top: (Long, Int) = null
        for (l <- 1 to math.min(4, i);
             sc <- scores.get(w.substring(i - l, i));
             b <- best(i - l)) {
          val c = (b + sc, l)
          if (top == null || c._1 > top._1 ||
              (c._1 == top._1 && c._2 > top._2)) top = c
        }
        if (top != null) { best(i) = Some(top._1); ptr(i) = top._2 }
      }
      val ps = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = w.length
      while (pos > 0) {
        ps.prepend(w.substring(pos - ptr(pos), pos)); pos -= ptr(pos)
      }
      (ps.length, best(w.length).get, ps.mkString(" "))
    }
    assert(got.nonEmpty && got.map(_._1).toSet == freqs.keySet)
    for ((word, freq, nPieces, score, segd) <- got) {
      assert(freq == freqs(word), word)
      assert((nPieces, score, segd) == dp(word), s"word=$word")
      // every emitted piece is in the soft vocabulary
      assert(segd.split(" ").forall(scores.contains), word)
    }
  }

  test("unigram sampleSegments: seeded FFBS == a full plain-JVM replica; deterministic") {
    import graft.functions.Unigram
    val docs = Seq("aba ab aba cab", "dddd aba ab", "xyzw xyzw ab")
      .toDF("text")
    val nSamples = 3
    val alphaPpm = 500000L
    val seedStr = "specseed"
    def run() = Unigram.sampleSegments(docs, "text", maxPieceLen = 4,
        nSamples = nSamples, alphaPpm = alphaPpm, seed = seedStr)
      .orderBy("word", "sample_id")
      .as[(String, Long, Int, Int, String)].collect().toSeq
    val got = run()
    assert(got == run(), "seeded sampling must be deterministic")

    // plain-JVM replica: seed census scores, temperature scaling, the
    // quantized-lse forward lattice, and the backward walk with the
    // exact md5-slice draws the engine makes
    val freqs = docs.as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freqs; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      cnt(w.substring(i, i + l)) = cnt.getOrElse(w.substring(i, i + l), 0L) + f
    val t = cnt.values.sum.toDouble
    val sa: Map[String, Long] = cnt.toMap.map { case (p, c) =>
      val s = math.floor(math.log(c / t) * 1e6 + 0.5).toLong
      p -> math.floor(s * alphaPpm / 1e6 + 0.5).toLong
    }
    def lse(cs: Seq[Long]): Long = {
      val mx = cs.max
      val se = cs.foldLeft(0.0)((a, c) => a + math.exp((c - mx) / 1e6))
      math.floor(mx + math.log(se) * 1e6 + 0.5).toLong
    }
    def fwd(w: String): Array[Long] = {
      val a = Array.fill(w.length + 1)(0L)
      for (i <- 1 to w.length)
        a(i) = lse((1 to math.min(4, i)).flatMap(l =>
          sa.get(w.substring(i - l, i)).map(a(i - l) + _)))
      a
    }
    def md5u32(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(24, 32), 16)
    }
    def walkRep(w: String, k: Int): Seq[String] = {
      val a = fwd(w)
      var pos = w.length
      var step = 0
      val ps = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos > 0) {
        step += 1
        val ws: Seq[Option[Long]] = (1 to 4).map { l =>
          if (l <= pos) sa.get(w.substring(pos - l, pos)).map { sc =>
            math.floor(math.exp((a(pos - l) + sc - a(pos)) / 1e6) * 1e6
              + 0.5).toLong
          } else None
        }
        val total = ws.flatten.sum
        assert(total > 0, s"zero weight sum at $w pos=$pos")
        val h = md5u32(s"sseg|$seedStr|$w|$k|$step") % total
        var cum = 0L; var pick = 0; var l = 1
        while (pick == 0 && l <= 4) {
          ws(l - 1).foreach { wt =>
            if (h < cum + wt) pick = l else cum += wt
          }
          l += 1
        }
        ps.prepend(w.substring(pos - pick, pos))
        pos -= pick
      }
      ps.toSeq
    }
    assert(got.map(_._1).toSet == freqs.keySet)
    assert(got.groupBy(_._1).forall(_._2.map(_._3) == (1 to nSamples)))
    for ((word, freq, sid, nPieces, segd) <- got) {
      assert(freq == freqs(word), word)
      // concatenation identity: samples are segmentations of the word
      assert(segd.replace(" ", "") == word, s"$word#$sid")
      val rep = walkRep(word, sid)
      assert(nPieces == rep.length && segd == rep.mkString(" "),
        s"$word#$sid: got '$segd' want '${rep.mkString(" ")}'")
    }
    // the draws actually vary: at alpha = 0.5 this fixture's ambiguous
    // words produce more than one distinct segmentation across samples
    assert(got.groupBy(_._1).values
      .exists(_.map(_._5).distinct.size > 1),
      "all samples identical — the sampler degenerated to Viterbi")
  }
}

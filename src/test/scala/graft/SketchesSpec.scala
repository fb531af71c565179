package graft

import graft.functions.{Sketches, Stats, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** JVM-side mirror of the sketch's (bucket, rho) contract, computed
    * independently from MessageDigest — pins the Spark column expressions
    * to the spec, not to themselves. */
  private def expectedBucketRho(v: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hex.substring(0, 3), 16)
    val tail = hex.substring(3, 13) // 10 hex chars = 40 bits
    val z = tail.takeWhile(_ == '0').length
    val rho =
      if (z >= 10) Sketches.RhoCap
      else {
        val nv = Integer.parseInt(tail(z).toString, 16)
        val nlz = if (nv >= 8) 0 else if (nv >= 4) 1 else if (nv >= 2) 2 else 3
        math.min(4 * z + nlz + 1, Sketches.RhoCap)
      }
    (bucket, rho)
  }

  test("hllSketch bucket/rho match an independent MessageDigest replay") {
    val vals = (0 until 200).map(i => s"value_$i")
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val got = Sketches.hllSketch(df, Seq("g"), col("v"))
      .select("bucket", "max_rho").as[(Int, Int)].collect().toMap
    // independently aggregate max rho per bucket
    val want = vals.map(expectedBucketRho).groupBy(_._1)
      .map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got == want)
  }

  test("hll estimate is within 5% of exact distinct at n >> m buckets used") {
    val n = 20000
    val df = (0 until n).map(i => ("g", s"user_$i")).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), col("v"))
      .select("hll_est").as[Double].head()
    assert(math.abs(est - n) / n < 0.05, s"est $est vs exact $n")
  }

  test("duplicates do not move the sketch: distinct of multiset == of set") {
    val uniq = (0 until 500).map(i => ("g", s"u$i"))
    val dup = uniq ++ uniq ++ uniq
    val a = Sketches.hllDistinct(uniq.toDF("g", "v"), Seq("g"), col("v"))
      .select("s_scaled").as[Long].head()
    val b = Sketches.hllDistinct(dup.toDF("g", "v"), Seq("g"), col("v"))
      .select("s_scaled").as[Long].head()
    assert(a == b)
  }

  test("merge law: sketch(A union B) == merge(sketch(A), sketch(B)) exactly") {
    val df = (0 until 2000).map(i => (s"src${i % 3}", s"doc_$i")).toDF("g", "v")
    val direct = Sketches.hllDistinct(df, Seq("g"), col("v"))
      .select("g", "v_empty", "s_scaled", "hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    val subs = Seq(
      Sketches.hllSketch(df.filter(xxhash64(col("v")) % 2 === 0), Seq("g"), col("v")),
      Sketches.hllSketch(df.filter(xxhash64(col("v")) % 2 =!= 0), Seq("g"), col("v")))
    val merged = Sketches.hllEstimate(Sketches.hllMerge(subs, Seq("g")), Seq("g"))
      .select("g", "v_empty", "s_scaled", "hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(direct == merged)
  }

  test("ewmaDecay: exact scaled integer recurrence on a hand-computed series") {
    // one key, values 1.00, 2.00, 3.00 -> xq = 100, 200, 300; lags=2:
    // t0: 100<<2              = 400
    // t1: 200<<2 + 100<<1     = 1000
    // t2: 300<<2 + 200<<1 + 100 = 1700
    val ev = Seq((1L, "2024-01-01 00:00:01", 1.0),
        (2L, "2024-01-01 00:00:02", 2.0),
        (3L, "2024-01-01 00:00:03", 3.0))
      .toDF("event_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("user_id", lit(7L))
    val out = Stats.ewmaDecay(ev, "user_id", "ts", "event_id", "value", lags = 2)
      .orderBy("event_id").select("ewma_scaled").as[Long].collect()
    assert(out.toSeq == Seq(400L, 1000L, 1700L))
  }

  test("ewmaDecay: series are independent per key and zero-initialized") {
    val ev = Seq((1L, 10L, 5.0), (2L, 20L, 5.0))
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val out = Stats.ewmaDecay(ev, "user_id", "ts", "event_id", "value", lags = 3)
      .select("ewma_scaled").as[Long].collect()
    // both are series starts: 500 << 3 = 4000, no cross-key bleed
    assert(out.toSeq == Seq(4000L, 4000L))
  }

  test("phraseSearch finds every aligned occurrence, including overlaps") {
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" at 0 and 2 (overlapping)
      (2L, "a b"), // prefix only
      (3L, "x a b a y"), // at 1
      (4L, "b a b a")) // at 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "a"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (1L, 2), (3L, 1), (4L, 1)))
  }

  test("phraseSearch with repeated terms aligns each occurrence at its own offset") {
    val docs = Seq((1L, "w w w"), (2L, "w x w")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, "doc_id", "text", Seq("w", "w"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (1L, 1)))
  }

  test("single-term phrase degrades to the postings list") {
    val docs = Seq((1L, "q r q")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, "doc_id", "text", Seq("q"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (1L, 2)))
  }

  test("kmv small-set rule: under k values the estimate IS the exact count") {
    val df = (0 until 100).map(i => ("g", s"v$i")).toDF("g", "v")
    val out = Sketches.kmvEstimate(
        Sketches.kmvSketch(df, Seq("g"), col("v"), k = 256), Seq("g"))
      .select("n_sketch", "est_distinct").as[(Long, Double)].head()
    assert(out == ((100L, 100.0)))
  }

  test("kmv estimate within 15% of exact at n >> k") {
    val n = 30000
    val df = (0 until n).map(i => ("g", s"item_$i")).toDF("g", "v")
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(df, Seq("g"), col("v")), Seq("g"))
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - n) / n < 0.15, s"est $est vs exact $n")
  }

  test("kmv sketch holds the k smallest hashes, deduplicated") {
    val vals = (0 until 1000).map(i => s"x$i")
    val df = (vals ++ vals).map(("g", _)).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), col("v"), k = 50)
      .select("h").as[Long].collect().sorted.toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = vals.map { v =>
      val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }.distinct.sorted.take(50)
    assert(sk == expected)
  }

  test("daily HLL sketch rollup: pruned range merge == direct sketch of the range") {
    val dir = java.nio.file.Files.createTempDirectory("hllroll").toString
    val ev = (0 until 400).map { i =>
      (i.toLong, f"2024-01-${1 + i % 20}%02d 12:00:00", 100L + i % 77, s"t${i % 2}")
    }.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    graft.sources.Layout.writeDailyHllSketch(ev, dir, col("user_id"))
    val got = graft.sources.Layout
      .readHllRangeEstimate(spark, dir, "2024-01-05", "2024-01-12")
      .select("event_type", "v_empty", "s_scaled", "hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    val want = Sketches.hllDistinct(
        ev.filter(to_date(col("ts")).between("2024-01-05", "2024-01-12")),
        Seq("event_type"), col("user_id"))
      .select("event_type", "v_empty", "s_scaled", "hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("rolling curve from the rollup == per-window direct sketches, " +
    "bit-exact") {
    val dir = java.nio.file.Files.createTempDirectory("hllcurve").toString
    val ev = (0 until 400).map { i =>
      (i.toLong, f"2024-01-${1 + i % 10}%02d 12:00:00", 100L + i % 77, s"t${i % 2}")
    }.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    graft.sources.Layout.writeDailyHllSketch(ev, dir, col("user_id"))
    val got = graft.sources.Layout
      .readHllRollingCurve(spark, dir, windowDays = 3)
      .select("event_type", "day", "s_scaled")
      .as[(String, String, Long)].collect().toSet
    val want = (1 to 10).flatMap { d =>
      val lo = f"2024-01-${math.max(1, d - 2)}%02d"
      val hi = f"2024-01-$d%02d"
      Sketches.hllDistinct(
          ev.filter(to_date(col("ts")).between(lo, hi)),
          Seq("event_type"), col("user_id"))
        .select("event_type", "s_scaled").as[(String, Long)].collect()
        .map { case (t, s) => (t, hi, s) }
    }.toSet
    assert(got == want)
  }

  test("daily logHist sketch rollup: pruned range merge == direct sketch " +
    "of the range") {
    val dir = java.nio.file.Files.createTempDirectory("lhroll").toString
    val ev = (0 until 400).map { i =>
      (i.toLong, f"2024-01-${1 + i % 20}%02d 12:00:00",
        (1.0 + (i * 13) % 5000) / 100.0, s"t${i % 2}")
    }.toDF("event_id", "ts_s", "value", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    graft.sources.Layout.writeDailyLogHistSketch(ev, dir,
      graft.functions.Money.cents(col("value")))
    val got = graft.sources.Layout
      .readLogHistRangeQuantiles(spark, dir, "2024-01-05", "2024-01-12",
        Seq(500, 950))
      .select("event_type", "q_permille", "n_rows", "qtile_lb")
      .as[(String, Int, Long, Long)].collect().toSet
    val want = Sketches.logHistDistribution(
        ev.filter(to_date(col("ts")).between("2024-01-05", "2024-01-12")),
        Seq("event_type"), graft.functions.Money.cents(col("value")),
        Seq(500, 950))
      .select("event_type", "q_permille", "n_rows", "qtile_lb")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("kmv pair estimates: disjoint sets have zero intersection, " +
    "heavily overlapping sets track true jaccard") {
    // A and B share 900 of 1000 values; C is disjoint from both
    val shared = (0 until 900).map(i => s"s$i")
    val a = shared ++ (0 until 100).map(i => s"a$i")
    val b = shared ++ (0 until 100).map(i => s"b$i")
    val c = (0 until 1000).map(i => s"c$i")
    val df = (a.map(("a", _)) ++ b.map(("b", _)) ++ c.map(("c", _)))
      .toDF("g", "v")
    val sk = Sketches.kmvSketch(df, Seq("g"), col("v")).select("g", "h")
    val out = Sketches.kmvPairEstimates(sk, "g")
      .select("g_a", "g_b", "jaccard_est", "inter_est")
      .as[(String, String, Double, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val (jAb, iAb) = out(("a", "b"))
    assert(math.abs(jAb - 900.0 / 1100.0) < 0.12, s"jaccard $jAb")
    assert(math.abs(iAb - 900.0) / 900.0 < 0.25, s"intersection $iAb")
    assert(out(("a", "c"))._1 == 0.0 && out(("b", "c"))._1 == 0.0)
  }

  /** JVM-side mirror of the log-histogram bucket contract: octave from
    * leading zeros, sub-bucket, lower bound — independent of the Spark
    * column expressions. */
  private def expectedLogBucket(v: Long): (Int, Int, Long) =
    if (v < 1) (-1, 0, 0L)
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val p = 1L << e
      val sub = (((v - p) * Sketches.QsSub) / p).toInt
      val lb = ((Sketches.QsSub + sub) * p) / Sketches.QsSub
      (e, sub, lb)
    }

  test("logHistSketch bucket assignment matches an independent JVM replay") {
    val vals = Seq(0L, 1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 100L, 1023L,
      1024L, 49002L, 104997L, 1L << 40, (1L << 41) - 1)
    val got = Sketches.logHistSketch(
        vals.toDF("v").withColumn("g", lit("all")), Seq("g"), col("v"))
      .select("e", "sub", "cnt").as[(Int, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val want = vals.map(expectedLogBucket).groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.size.toLong }
    assert(got == want)
  }

  test("logHist quantiles: lower bound <= exact order statistic, " +
    "relative error < 1/QsSub at every quantile") {
    val rnd = new scala.util.Random(7)
    val vals = (0 until 5000).map(_ => 1L + rnd.nextInt(2000000).toLong)
    val df = vals.toDF("v").withColumn("g", lit("all"))
    val perm = Seq(100, 250, 500, 900, 990, 999)
    val got = Sketches.logHistDistribution(df, Seq("g"), col("v"), perm)
      .select("q_permille", "qtile_lb").as[(Int, Long)].collect().toMap
    val sorted = vals.sorted
    perm.foreach { q =>
      val r = (vals.size.toLong * q + 999) / 1000 // ceil rank, 1-based
      val exact = sorted((r - 1).toInt)
      val lb = got(q)
      assert(lb <= exact, s"q=$q lb=$lb exact=$exact")
      assert(exact - lb <= exact / Sketches.QsSub + 1,
        s"q=$q lb=$lb exact=$exact outside 1/${Sketches.QsSub} bound")
    }
  }

  test("logHist merge law: sum-merged slice sketches == direct sketch exactly") {
    val df = (0 until 3000)
      .map(i => (s"g${i % 2}", s"d${i % 5}", 1L + (i * 37) % 10000))
      .toDF("g", "day", "v")
    val direct = Sketches.logHistSketch(df, Seq("g"), col("v"))
      .select("g", "e", "sub", "cnt").as[(String, Int, Int, Long)]
      .collect().toSet
    val daily = Sketches.logHistSketch(df, Seq("g", "day"), col("v"))
    val merged = Sketches.logHistMerge(Seq(daily), Seq("g"))
      .select("g", "e", "sub", "cnt").as[(String, Int, Int, Long)]
      .collect().toSet
    assert(merged == direct)
    // and the quantile read off the merged sketch is identical too
    val qd = Sketches.logHistQuantiles(
        Sketches.logHistSketch(df, Seq("g"), col("v")), Seq("g"), Seq(500))
      .select("g", "qtile_lb").as[(String, Long)].collect().toSet
    val qm = Sketches.logHistQuantiles(
        Sketches.logHistMerge(Seq(daily), Seq("g")), Seq("g"), Seq(500))
      .select("g", "qtile_lb").as[(String, Long)].collect().toSet
    assert(qd == qm)
  }

  test("logHistRankPermille: lower-bounds the exact strict rank, equal " +
    "values share it, bounded gap on a uniform fixture") {
    val df = (1L to 1000L).toDF("v").withColumn("g", lit("x"))
    val got = Sketches.logHistRankPermille(df, Seq("g"), col("v"))
      .select("v", "rank_permille").as[(Long, Long)].collect().toMap
    (1L to 1000L).foreach { v =>
      val exact = (v - 1) * 1000 / 1000 // strictly-below permille
      assert(got(v) <= exact, s"v=$v got=${got(v)} exact=$exact")
      // uniform ints: rows below in the same bucket <= bucket width
      // <= v/16, i.e. <= 64 permille here (+1 for integer truncation)
      assert(exact - got(v) <= 64 + 1, s"v=$v got=${got(v)} exact=$exact")
    }
    // all-equal group: everything is in the first (and only) bucket
    val eq = Seq.fill(50)(7L).toDF("v").withColumn("g", lit("y"))
    val eqRanks = Sketches.logHistRankPermille(eq, Seq("g"), col("v"))
      .select("rank_permille").as[Long].collect().toSet
    assert(eqRanks == Set(0L))
  }

  test("rangePartitionAdvisor: boundaries increase, census conserves rows, " +
    "uniform data lands near-balanced ranges") {
    val df = (1L to 8000L).toDF("v")
    val out = Sketches.rangePartitionAdvisor(df, col("v"), numRanges = 8)
      .select("range_id", "lo_cents", "n_rows")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).sum == 8000L)
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted)
    assert(out.head._2 == 0L)
    // each range within the sketch's 1/16 granularity of the even split
    out.foreach { case (rid, _, n) =>
      assert(n >= 400 && n <= 1700, s"range $rid size $n not near 1000")
    }
  }

  test("logHist rank convention: ceil(n*q/1000) on a hand-built fixture") {
    // values 1..100 in one group: q=500 -> rank 50 -> value 50 whose
    // bucket is (e=5, sub=9), lb = (16+9)*32/16 = 50 (exact here)
    val df = (1L to 100L).toDF("v").withColumn("g", lit("x"))
    val got = Sketches.logHistDistribution(df, Seq("g"), col("v"),
        Seq(500, 1000))
      .select("q_permille", "n_rows", "qtile_lb")
      .as[(Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(500) == ((100L, 50L)))
    // q=1000 -> rank 100 -> value 100: e=6, sub=(100-64)*16/64=9,
    // lb = (16+9)*64/16 = 100
    assert(got(1000) == ((100L, 100L)))
  }

  test("hllRollingDistinct: every day's window sketch == direct sketch of " +
    "that window's slice, bit-exact") {
    // 10 days, overlapping user populations that shift over time
    val rows = (1 to 10).flatMap { d =>
      (d * 50 until d * 50 + 300).map(u => (f"2024-06-$d%02d 08:00:00", u.toLong))
    }
    val ev = rows.toDF("ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val rolling = Sketches.hllRollingDistinct(ev, "ts", col("user_id"),
        windowDays = 3)
      .select("day", "s_scaled").as[(String, Long)].collect().toMap
    assert(rolling.size == 10)
    (1 to 10).foreach { d =>
      val lo = math.max(1, d - 2)
      val slice = ev.filter(col("ts_s").substr(1, 10)
        .between(f"2024-06-$lo%02d", f"2024-06-$d%02d"))
      val direct = Sketches.hllDistinct(
          slice.withColumn("g", lit("w")), Seq("g"), col("user_id"))
        .select("s_scaled").as[Long].head()
      assert(rolling(f"2024-06-$d%02d") == direct, s"day $d")
    }
  }

  test("diversityIndex: single source scores 0; even k-way mix scores " +
    "ln k micronats") {
    val one = Seq.fill(10)(("en", "srcA")).toDF("lang", "source")
    val g1 = TextAnalysis.diversityIndex(one, "lang", "source")
      .select("n_items", "n_rows", "entropy_micronats")
      .as[(Long, Long, Long)].head()
    assert(g1 == ((1L, 10L, 0L)))
    // 4 sources x 25 docs: H = ln 100 - (25 * qln(25) * 4) / 100
    val even = (0 until 100).map(i => ("de", s"s${i % 4}"))
      .toDF("lang", "source")
    val g2 = TextAnalysis.diversityIndex(even, "lang", "source")
      .select("entropy_micronats").as[Long].head()
    val expect = math.floor(math.log(100.0) * 1e6 + 0.5).toLong -
      (25L * math.floor(math.log(25.0) * 1e6 + 0.5).toLong * 4L) / 100L
    assert(g2 == expect)
    // ~ ln 4 = 1386294 micronats
    assert(math.abs(g2 - 1386294L) <= 2L, s"got $g2")
  }

  test("concentrationGini: even mix scores 0; total concentration " +
    "approaches (k-1)/k; hand-computed skewed case exact") {
    val even = (0 until 100).map(i => ("en", s"s${i % 4}"))
      .toDF("lang", "source")
    val g0 = TextAnalysis.concentrationGini(even, "lang", "source")
      .select("gini_ppm").as[Long].head()
    assert(g0 == 0L)
    // counts 1, 1, 98 ascending: k=3, N=100,
    // G = (2*(1*1 + 2*1 + 3*98) - 4*100) / (3*100) = (594 - 400)/300
    val skew = (Seq(("de", "a")) ++ Seq(("de", "b")) ++
      Seq.fill(98)(("de", "c"))).toDF("lang", "source")
    val g1 = TextAnalysis.concentrationGini(skew, "lang", "source")
      .select("gini_ppm").as[Long].head()
    assert(g1 == 194L * 1000000L / 300L, s"got $g1")
  }

  test("zipfSlope: an exact power-law corpus fits slope -1e6 ppm within " +
    "quantization error; a flat corpus fits ~0") {
    // freq(rank r) = 1024 >> (r-1) approximates freq = C/2^(r-1) — NOT
    // Zipf; instead build true freq = C/r: ranks 1..8, freq 840/r exactly
    val zipf = (1 to 8).flatMap { r =>
      Seq.fill(840 / r)(s"w$r")
    }.mkString(" ")
    val s1 = TextAnalysis.zipfSlope(Seq(zipf).toDF("text"), "text")
      .select("zipf_slope_ppm").as[Long].head()
    assert(math.abs(s1 + 1000000L) < 20000L, s"got $s1") // within 2%
    // flat: every token equally frequent -> y constant -> slope 0
    val flat = (1 to 8).flatMap(r => Seq.fill(10)(s"w$r")).mkString(" ")
    val s2 = TextAnalysis.zipfSlope(Seq(flat).toDF("text"), "text")
      .select("zipf_slope_ppm").as[Long].head()
    assert(s2 == 0L, s"got $s2")
  }

  test("hllRollingDistinct: windowDays=1 matches the per-day sketch") {
    val rows = Seq(("2024-06-01 01:00:00", 1L), ("2024-06-01 02:00:00", 2L),
      ("2024-06-02 01:00:00", 2L))
    val ev = rows.toDF("ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Sketches.hllRollingDistinct(ev, "ts", col("user_id"),
        windowDays = 1)
      .select("day", "s_scaled").as[(String, Long)].collect().toMap
    val perDay = Sketches.hllDistinct(
        ev.withColumn("day", to_date(col("ts")).cast("string")),
        Seq("day"), col("user_id"))
      .select("day", "s_scaled").as[(String, Long)].collect().toMap
    assert(got == perDay)
  }

  test("hllRollingDistinct grouped: a group inactive on a global day " +
    "still gets a curve row while its window holds sketches (sparse " +
    "window-horizon semantics)") {
    val rows = Seq(
      ("2024-01-01 10:00:00", "a", 1L), ("2024-01-02 10:00:00", "a", 2L),
      // group b: active day 1 only — day 2 row must still appear
      ("2024-01-01 10:00:00", "b", 7L))
    val ev = rows.toDF("ts_s", "event_type", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Sketches.hllRollingDistinct(ev, "ts", col("user_id"),
        windowDays = 7, groupCols = Seq("event_type"))
      .select("event_type", "day").as[(String, String)].collect().toSet
    assert(got == Set(("a", "2024-01-01"), ("a", "2024-01-02"),
      ("b", "2024-01-01"), ("b", "2024-01-02")),
      s"window-horizon rows wrong: $got")
  }

  test("compactionPlan: size-desc cumulative next-fit bins; tiny files " +
    "pack together, a jumbo file opens its own bin") {
    import graft.sources.Layout
    val files = Seq(
      ("s1", 1L, 900L), ("s1", 2L, 900L), ("s1", 3L, 150L),
      ("s1", 4L, 100L), ("s2", 5L, 2500L))
      .toDF("source", "file_id", "bytes")
    val got = Layout.compactionPlan(files, "source", "file_id", "bytes",
        targetBytes = 1000L)
      .select("source", "bin", "n_files", "bytes")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // s1 order: 900,900,150,100 — cum_before: 0,900,1800,1950 ->
    // bins 0,0,1,1; s2: 2500 -> bin 0
    assert(got.toSeq == Seq(("s1", 0L, 2L, 1800L), ("s1", 1L, 2L, 250L),
      ("s2", 0L, 1L, 2500L)))
  }
}

package graft

import graft.functions.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("anomalousDays: a planted spike flags, steady days don't") {
    // 9 steady days of 10 events + one day of 100: z ~ 2.8 sigma
    val rows = (0 until 9).flatMap(d =>
      (0 until 10).map(i => (f"2024-02-${d + 1}%02d 12:00:00", "click"))) ++
      (0 until 100).map(i => ("2024-02-10 12:00:00", "click"))
    val ev = rows.toDF("ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Stats.anomalousDays(ev, "ts", "event_type", k = 2)
      .select("day", "is_anomaly").as[(String, Int)].collect().toMap
    assert(out("2024-02-10") == 1)
    assert((1 to 9).forall(d => out(f"2024-02-$d%02d") == 0))
  }

  test("anomalousDays: uniform volume flags nothing") {
    val rows = (0 until 10).flatMap(d =>
      (0 until 10).map(_ => (f"2024-02-${d + 1}%02d 12:00:00", "view")))
    val ev = rows.toDF("ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val flags = Stats.anomalousDays(ev, "ts", "event_type", k = 2)
      .select("is_anomaly").as[Int].collect()
    assert(flags.length == 10 && flags.forall(_ == 0))
  }

  test("heavyHitters: exact counts for heavy keys, long light tail excluded") {
    val rows = (0 until 1000).map(i => s"rare_$i") ++
      Seq.fill(50)("hot_a") ++ Seq.fill(23)("hot_b") ++ Seq.fill(9)("warm")
    val df = rows.toDF("k")
    val out = Stats.heavyHitters(df, "k", minCount = 10L)
      .as[(String, Long)].collect().toMap
    assert(out == Map("hot_a" -> 50L, "hot_b" -> 23L))
  }

  test("psi: identical snapshots score ~0; a shifted distribution scores high") {
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Stats.psi(a, a, "v", 0.0, 100.0, bins = 10)
      .agg(sum("psi_micronat")).head.getLong(0)
    assert(same == 0L) // p == q bucket-wise, every term is ln(1) = 0
    val shifted = (1 to 1000).map(i => (i % 100).toDouble + 50).toDF("v")
    val drift = Stats.psi(a, shifted, "v", 0.0, 100.0, bins = 10)
      .agg(sum("psi_micronat")).head.getLong(0)
    assert(drift > 200000L, s"psi = $drift micronats") // >> 0.2 threshold
    // clamping: values beyond hi land in the top bucket, not dropped
    val counts = Stats.psi(a, shifted, "v", 0.0, 100.0, bins = 10)
      .agg(sum("n_b")).head.getLong(0)
    assert(counts == 1000L)
  }

  test("expectations: every rule counts its exact violations; nulls split correctly") {
    import graft.functions.Expectations._
    val df = Seq(
      (Some(1L), Some("aa"), Some(10.0)),
      (Some(2L), None, Some(500.0)),      // null text; range violation
      (Some(2L), Some("b7"), Some(50.0)), // dup id; regex violation
      (None: Option[Long], Some("cc"), None)) // null id (not a dup)
      .toDF("id", "t", "v")
    val out = check(df, Seq(
      NotNull("t"), InRange("v", 0, 100), Matches("t", "^[a-z]*$"),
      Unique("id"),
      FkIn("id", Seq(1L).toDF("k"), "k")))
      .as[(String, Long)].collect().toMap
    assert(out("not_null(t)") == 1L)
    assert(out("in_range(v,0.0,100.0)") == 1L) // null v is NOT a range violation
    assert(out("matches(t)") == 1L)            // null t is NOT a regex violation
    assert(out("unique(id)") == 1L)            // one extra copy of id=2; nulls excluded
    assert(out("fk(id)") == 2L)                // both id=2 rows are orphans
  }

  test("profile: counts nulls and distincts per column, min/max as strings") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "v")
    val p = Stats.profile(df, Seq("id", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(p("v") == (("v", 4L, 1L, 2L, "a", "b")))
  }

  test("groupedExactPercentiles matches the brute-force order statistic") {
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    val fracs = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Stats.groupedExactPercentiles(docs, "lang", "n_chars", fracs,
        bucketWidth = 100L)
      .as[(String, Double, Long)].collect().toSet
    val byLang = docs.select($"lang", $"n_chars").as[(String, Long)]
      .collect().groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    val want = (for {
      (l, vs) <- byLang
      f <- fracs
    } yield (l, f, vs(math.ceil(vs.length * f).toInt - 1))).toSet
    assert(got == want)
  }

  test("groupedExactPercentiles: width-independent, and exact on a jumbo skewed group") {
    val skew = spark.range(100000).select(
      when($"id" % 100 === 0, "small").otherwise("jumbo").as("g"),
      ($"id" % 777).cast("long").as("v"))
    val w1 = Stats.groupedExactPercentiles(skew, "g", "v", Seq(0.5, 0.95), 1L)
      .as[(String, Double, Long)].collect().toSet
    val w1000 = Stats.groupedExactPercentiles(skew, "g", "v", Seq(0.5, 0.95),
        1000L)
      .as[(String, Double, Long)].collect().toSet
    assert(w1 == w1000, "cutoffs must not depend on the histogram width")
    // negative values go through the same floor-division path
    val neg = spark.range(1000).select(lit("g").as("g"),
      ($"id" - 500).cast("long").as("v"))
    val cut = Stats.groupedExactPercentiles(neg, "g", "v", Seq(0.5), 64L)
      .as[(String, Double, Long)].head()
    assert(cut._3 == -1L) // ceil(1000*0.5)=500 -> 500th smallest of -500..499
  }

  test("kAnonymityCensus: class sizes, counts, and at-risk flag on a " +
    "hand-built fixture") {
    // QI (a, b): class (1,x) has 1 row, (1,y) has 3, (2,x) has 3, (2,y) has 5
    val rows = Seq((1, "x")) ++ Seq.fill(3)((1, "y")) ++
      Seq.fill(3)((2, "x")) ++ Seq.fill(5)((2, "y"))
    val got = Stats.kAnonymityCensus(rows.toDF("a", "b"), Seq("a", "b"), k = 4)
      .select("class_size", "n_classes", "n_rows", "at_risk")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 1L, 1), (3L, 2L, 6L, 1), (5L, 1L, 5L, 0)))
    // row conservation: n_rows sums to the table size
    assert(got.toSeq.map(_._3).sum == rows.size)
  }
}

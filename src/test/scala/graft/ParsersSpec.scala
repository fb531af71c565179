package graft

import graft.functions.Templates
import graft.operators.{Filters, Partitioners, TemplateExpr}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ParsersSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  def df = Seq(
    (1L, "click", 50.0, "alice"),
    (2L, "view", 5.0, "bob"),
    (3L, "purchase", 150.0, "carol"),
    (4L, "clickbait", 75.0, null)).toDF("id", "event_type", "value", "user")

  // ---- solr filter (datacrawler.py:138-151 surface) ----

  test("solr *:* matches all") {
    assert(Filters.solr(df, "*:*").count() == 4)
  }

  test("solr equality / prefix / exists / range") {
    assert(Filters.solr(df, "event_type:click").count() == 1)
    assert(Filters.solr(df, "event_type:click*").count() == 2)
    assert(Filters.solr(df, "user:*").count() == 3)
    assert(Filters.solr(df, "value:[10 TO 100]").count() == 2)
    assert(Filters.solr(df, "value:[* TO 50]").count() == 2)
    assert(Filters.solr(df, "value:[75 TO *]").count() == 2)
  }

  test("solr AND / OR / NOT / parens") {
    assert(Filters.solr(df, "event_type:click OR event_type:view").count() == 2)
    assert(Filters.solr(df, "value:[10 TO 200] AND NOT event_type:purchase").count() == 2)
    assert(Filters.solr(df, "(event_type:view OR event_type:purchase) AND value:[100 TO *]").count() == 1)
    assert(Filters.solr(df, "NOT (event_type:click OR event_type:view)").count() == 2)
  }

  test("solr field grouping: field:(a OR b) and implicit-OR terms") {
    assert(Filters.solr(df, "event_type:(click view)").count() == 2)
    assert(Filters.solr(df, "event_type:(click OR view OR purchase)").count() == 3)
    assert(Filters.solr(df, "event_type:(click*) AND value:[60 TO *]").count() == 1)
    intercept[IllegalArgumentException] { Filters.solrPredicate("event_type:()") }
  }

  test("solr quoted terms and garbage input") {
    assert(Filters.solr(df, "event_type:\"click\"").count() == 1)
    intercept[IllegalArgumentException] {
      Filters.solrPredicate("event_type:click ) garbage (")
    }
  }

  // ---- convertTo template expressions (worker.py:149-150 shape) ----

  test("template expr: concat with str(), arithmetic, parens, literals") {
    def eval(e: String): Any =
      df.filter($"id" === 1).select(TemplateExpr.column(e)).head.get(0)
    assert(eval("str(row['id']) + '-' + row['event_type']") == "1-click")
    assert(eval("int(row['id']) * 100 + 7") == 107L)
    assert(eval("(int(row['id']) + 1) * 3") == 6L)
    assert(eval("'prefix-' + str(row[\"value\"])") == "prefix-50.0")
    intercept[IllegalArgumentException] { TemplateExpr.column("__import__('os')") }
  }

  // ---- %-format render templates (§2.3) ----

  test("render template: placeholders, [DQ], %%, null coalescing") {
    val t = "{[DQ]u[DQ]: [DQ]%(user)s[DQ], [DQ]pct[DQ]: [DQ]%(value)s%%[DQ]}"
    val out = df.select(Templates.render(t).as("r")).orderBy($"r")
    val rows = df.withColumn("r", Templates.render(t))
      .orderBy("id").select("r").as[String].collect()
    assert(rows(0) == """{"u": "alice", "pct": "50.0%"}""")
    assert(rows(3) == """{"u": "", "pct": "75.0%"}""") // null user -> empty
    assert(Templates.fields(t) == Seq("user", "value"))
  }

  // ---- round-robin schedules (roundrobin.py) ----

  test("smooth WRR pins FIXTURES.md B.5: weights 0:3,1:1 -> 0,0,1,0") {
    assert(Partitioners.smoothSchedule(Seq(0 -> 3, 1 -> 1)) == Seq(0, 0, 1, 0))
  }

  test("smooth WRR nginx canonical: weights 5,1,1 interleave") {
    // nginx's documented smooth-wrr example: a,a,b,a,c,a,a
    assert(Partitioners.smoothSchedule(Seq(0 -> 5, 1 -> 1, 2 -> 1)) ==
      Seq(0, 0, 1, 0, 2, 0, 0))
  }

  test("weighted + basic schedules and parseWeights") {
    assert(Partitioners.parseWeights("0:3, 1:1") == Seq(0 -> 3, 1 -> 1))
    val ws = Partitioners.weightedSchedule(Seq(2 -> 5, 7 -> 3, 9 -> 2))
    assert(ws.size == 10 && ws.count(_ == 2) == 5 && ws.count(_ == 7) == 3)
    val assigned = df.orderBy("id")
      .select(Partitioners.basicAssign(row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("id")), 3))
      .as[Int].collect()
    assert(assigned.toSeq == Seq(0, 1, 2, 0))
  }
}

package graft

import graft.operators.{Filters, Transforms}
import graft.spec.TableSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests over FIXTURES.md §B — the reference-shaped canonical record
  * (`worker.py:110-162` semantics), no parquet needed. */
class TransformsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** FIXTURES.md B.1 canonical source record. */
  def canonical = {
    val json = Seq(
      """{"id": "081e5e0e-2250-11ea-adeb-76c7eccdc391",
        | "client_id": "00000000-0000-0000-0000-000000000000",
        | "name": "some name", "amount": 42, "active": true,
        | "payload": "{\"a\": 1, \"b\": {\"c\": \"x\"}}",
        | "items": ["{\"sku\": \"p1\", \"qty\": 2}", "{\"sku\": \"p2\", \"qty\": 1}"],
        | "attrs": {"k1": "{\"v\": 10}", "k2": "{\"v\": 20}"},
        | "modified_timestamp": "2019-12-19 10:29:31.429000Z",
        | "secret": "drop-me", "old_name": "rename-me"}""".stripMargin.replaceAll("\n", ""),
      """{"name": "no id or ts", "amount": 7, "old_name": "x", "secret": "s"}""")
    spark.read.json(json.toDS)
  }

  test("rename_cols renames without touching values (fixes worker.py:117-119 string-replace bug)") {
    val out = Transforms.renameCols(canonical, Seq("old_name" -> "new_name"))
    assert(out.columns.contains("new_name") && !out.columns.contains("old_name"))
    assert(out.select("new_name").orderBy(desc("new_name")).head.getString(0) == "x")
  }

  test("convert_object parses JSON-string column to struct") {
    val out = Transforms.convertObject(canonical, "payload",
      StructType.fromDDL("a BIGINT, b STRUCT<c: STRING>"))
    val row = out.filter($"name" === "some name")
      .select($"payload.a", $"payload.b.c").head
    assert(row.getLong(0) == 1L && row.getString(1) == "x")
  }

  test("convert_list parses each array element") {
    val out = Transforms.convertList(canonical, "items",
      StructType.fromDDL("sku STRING, qty BIGINT"))
    val items = out.filter($"name" === "some name")
      .select(expr("items[0].sku"), expr("items[1].qty")).head
    assert(items.getString(0) == "p1" && items.getLong(1) == 1L)
  }

  test("convert_map parses each map value") {
    // spark.read.json infers `attrs` as a struct; the reference shape is a
    // map of string -> JSON string, so rebuild it as MapType first
    val withMap = canonical.withColumn("attrs",
      from_json(to_json(col("attrs")), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)))
    val out = Transforms.convertMap(withMap, "attrs",
      StructType.fromDDL("v BIGINT"))
    val v = out.filter($"name" === "some name")
      .select(expr("attrs['k2'].v")).head
    assert(v.getLong(0) == 20L)
  }

  test("convert_timestamp: default format, Z normalization, epoch millis") {
    val out = Transforms.convertTimestamp(canonical, "modified_timestamp")
    val ms = out.filter($"name" === "some name")
      .select($"modified_timestamp").head.getLong(0)
    assert(ms == 1576751371429L) // strptime('2019-12-19 10:29:31.429000+0000')
    // absent timestamp stays null (watermark only applies when present)
    assert(out.filter($"name" === "no id or ts")
      .select($"modified_timestamp").head.isNullAt(0))
  }

  test("convert_template: FIXTURES B.2 shape str(row['amount']) + '-' + row['name']") {
    val out = Transforms.convertTemplate(canonical, "derived",
      "str(row['amount']) + '-' + row['name']")
    assert(out.filter($"name" === "some name")
      .select($"derived").head.getString(0) == "42-some name")
  }

  test("applySpec: full pipeline in reference order (rename -> convert -> remove)") {
    val spec = TableSpec.parse(
      """{"columns": [
        |  {"name": "old_name", "renameTo": "new_name"},
        |  {"name": "payload", "convertTo": "object", "schema": "a BIGINT, b STRUCT<c: STRING>"},
        |  {"name": "modified_timestamp", "convertTo": "timestamp",
        |   "timestamp_format": "%Y-%m-%d %H:%M:%S.%f%z"},
        |  {"name": "derived", "convertTo": "template:str(row['amount']) + '-' + row['name']"},
        |  {"name": "secret", "remove": true}
        |]}""".stripMargin)
    val out = Transforms.applySpec(canonical, spec)
    assert(!out.columns.contains("secret") && !out.columns.contains("old_name"))
    val row = out.filter($"name" === "some name")
      .select($"new_name", $"payload.a", $"modified_timestamp", $"derived").head
    assert(row.getString(0) == "rename-me" && row.getLong(1) == 1L &&
      row.getLong(2) == 1576751371429L && row.getString(3) == "42-some name")
  }

  test("inject_id fills only missing ids; deterministic fallback is stable") {
    val out = Transforms.injectId(canonical.select("id", "name", "amount"))
    val kept = out.filter($"name" === "some name").select($"id").head.getString(0)
    assert(kept == "081e5e0e-2250-11ea-adeb-76c7eccdc391")
    val injected1 = out.filter($"name" === "no id or ts").select($"id").head.getString(0)
    val injected2 = Transforms.injectId(canonical.select("id", "name", "amount"))
      .filter($"name" === "no id or ts").select($"id").head.getString(0)
    assert(injected1 != null && injected1 == injected2)
  }

  test("attach_raw_json embeds the whole row") {
    val out = Transforms.attachRawJson(canonical.select("name", "amount"))
    val j = out.filter($"name" === "no id or ts").select($"json").head.getString(0)
    assert(j == """{"name":"no id or ts","amount":7}""")
  }

  test("watermark boundary: ts >= filter excluded, ts < filter kept (worker.py:197)") {
    val df = Seq((1L, Some(100L)), (2L, Some(200L)), (3L, Some(300L)),
      (4L, None)).toDF("id", "ts_ms")
    val out = Filters.watermark(df, col("ts_ms"), 200L)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("python strptime format translation") {
    assert(Transforms.pythonToSparkFormat("%Y-%m-%d %H:%M:%S.%f%z") ==
      "yyyy-MM-dd HH:mm:ss.SSSSSSxx")
  }

  test("convert_timestamp: ISO-8601 format with literal T parses end-to-end") {
    val df = Seq("2019-12-19T10:29:31Z").toDF("t")
    val ms = df.select(Transforms.timestampMillis(col("t"),
      "%Y-%m-%dT%H:%M:%S%z").as("ms")).head.getLong(0)
    assert(ms == 1576751371000L)
  }

  test("scd2Merge: history untouched, one open version per key, no-ops change nothing") {
    import graft.functions.Scd
    val base = Seq(
      (1L, "A", 0L, Some(500L)), // closed history row
      (1L, "B", 500L, None), // current for key 1
      (2L, "A", 0L, None), // will receive a no-op change
      (3L, "C", 0L, None)) // untouched
      .toDF("id", "segment", "valid_from", "valid_to")
      .withColumn("valid_to", $"valid_to".cast("long"))
    val changes = Seq(
      (1L, "Z", 1000L), // real change
      (2L, "A", 1000L), // no-op: same attribute
      (9L, "N", 1000L)) // brand-new key
      .toDF("id", "segment", "ts")
    val got = Scd.scd2Merge(base, changes, "id", Seq("segment"), "ts")
      .as[(Long, String, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, "A", 0L, Some(500L)), // history preserved verbatim
      (1L, "B", 500L, Some(1000L)), // current closed at batch ts
      (1L, "Z", 1000L, None), // new open version
      (2L, "A", 0L, None), // no-op: still open, untouched
      (3L, "C", 0L, None), // no change row: untouched
      (9L, "N", 1000L, None))) // brand-new key appended open
    // invariant: exactly one open version per key
    val openPerKey = got.filter(_._4.isEmpty).groupBy(_._1).values.map(_.length)
    assert(openPerKey.forall(_ == 1))
  }
}

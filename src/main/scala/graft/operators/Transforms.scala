package graft.operators

import graft.spec.{ColumnSpec, TableSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The table-specs-driven transform pipeline, re-expressed as column
  * expressions so the whole thing stays inside whole-stage codegen.
  *
  * Reference pipeline (identical in all four sink workers, e.g.
  * `/root/reference/wadlabs/hub/migration/kafkaworker.py:173-190`):
  * `rename_columns` -> `json.loads` -> watermark/offset filters ->
  * `convert_columns` -> sink render. The per-directive semantics live in
  * `worker.py:110-162`:
  *
  *  - rename (`worker.py:110-121`): implemented there as string-replace on the
  *    raw JSON text — a known substring-collision bug. We implement the
  *    *intent*: a column rename. [divergence documented in SURVEY.md §7]
  *  - `convertTo: "object"` (`worker.py:136-137`): JSON-string column ->
  *    nested object => `from_json(col, schema)`.
  *  - `convertTo: "list"` (`worker.py:138-142`): per-element `json.loads` =>
  *    `transform(col, x -> from_json(x, schema))`.
  *  - `convertTo: "map"` (`worker.py:143-145`): per-value `json.loads` =>
  *    `transform_values(col, (k, v) -> from_json(v, schema))`.
  *  - `convertTo: "timestamp"` (`worker.py:146-148`): `strptime` with
  *    `Z`->`+0000` normalization, default format `%Y-%m-%d %H:%M:%S.%f%z`
  *    (`app.py:307`), result epoch **millis** (long).
  *  - `convertTo: "template:<expr>"` (`worker.py:149-150`): restricted
  *    expression over the row -> [[TemplateExpr]] translation to Catalyst.
  *  - `remove: true` (`worker.py:153-155`): drop column.
  *  - S3 `inject_id` (`s3worker.py:72-73`), RDS `attach_raw_json`
  *    (`rdsworker.py:97`).
  *
  * Every operator is `DataFrame => DataFrame` over built-in functions —
  * narrow, no shuffle, fully pushdown-transparent: at 100 TB these fuse into
  * the scan stage.
  */
object Transforms {

  /** Default timestamp format of the reference (`app.py:307`), in Python
    * strptime directives. */
  val DefaultTimestampFormat = "%Y-%m-%d %H:%M:%S.%f%z"

  def renameCols(df: DataFrame, renames: Seq[(String, String)]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** JSON-string column -> struct. */
  def convertObject(df: DataFrame, name: String, schema: DataType): DataFrame =
    df.withColumn(name, from_json(col(name), schema))

  /** Array-of-JSON-strings column -> array of structs. */
  def convertList(df: DataFrame, name: String, schema: DataType): DataFrame =
    df.withColumn(name, transform(col(name), x => from_json(x, schema)))

  /** Map-of-string->JSON-string column -> map of string->struct. */
  def convertMap(df: DataFrame, name: String, schema: DataType): DataFrame =
    df.withColumn(name, transform_values(col(name), (_, v) => from_json(v, schema)))

  /** Timestamp-string column -> epoch millis (LongType), with the reference's
    * trailing-`Z` normalization (`worker.py:148`). */
  def convertTimestamp(df: DataFrame, name: String,
      pyFormat: String = DefaultTimestampFormat): DataFrame =
    df.withColumn(name, timestampMillis(col(name), pyFormat))

  def timestampMillis(c: Column, pyFormat: String = DefaultTimestampFormat): Column = {
    val fmt = pythonToSparkFormat(pyFormat)
    unix_millis(to_timestamp(regexp_replace(c, "Z$", "+0000"), fmt))
  }

  /** Python strptime directive -> Spark datetime-pattern translation for the
    * directives the reference surface uses. Literal ASCII letters outside
    * directives are single-quoted (`T` in ISO-8601 would otherwise be read
    * as a pattern letter and rejected). */
  def pythonToSparkFormat(py: String): String = {
    val map = Map(
      'Y' -> "yyyy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'M' -> "mm", 'S' -> "ss",
      'f' -> "SSSSSS", 'z' -> "xx", '%' -> "%")
    val out = new StringBuilder
    var i = 0
    while (i < py.length) {
      val c = py(i)
      if (c == '%' && i + 1 < py.length && map.contains(py(i + 1))) {
        out ++= map(py(i + 1)); i += 2
      } else if (c.isLetter) {
        out += '\''; out += c; out += '\''; i += 1
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Computed column from a reference-shaped template expression. */
  def convertTemplate(df: DataFrame, name: String, pyExpr: String): DataFrame =
    df.withColumn(name, TemplateExpr.column(pyExpr))

  /** S3 parity: inject an id when the record lacks one (`s3worker.py:72-73`).
    * The reference uses `uuid1()`; `deterministic = true` substitutes a
    * content-derived id so runs are replayable and oracle-comparable — at
    * 100 TB a deterministic id is also what makes speculative-execution and
    * task-retry produce identical output.
    */
  def injectId(df: DataFrame, idCol: String = "id",
      deterministic: Boolean = true, fallback: Option[Column] = None): DataFrame = {
    val fb = fallback.getOrElse(
      if (deterministic) md5(to_json(struct(df.columns.map(col).toSeq: _*)))
      else expr("uuid()"))
    val base = if (df.columns.contains(idCol)) col(idCol) else lit(null).cast("string")
    df.withColumn(idCol, coalesce(base, fb))
  }

  /** RDS parity: re-attach the whole row as a JSON field (`rdsworker.py:97`). */
  def attachRawJson(df: DataFrame, name: String = "json"): DataFrame =
    df.withColumn(name, to_json(struct(df.columns.map(col).toSeq: _*)))

  /** Full spec-driven pipeline in reference order: rename -> convert/remove. */
  def applySpec(df: DataFrame, spec: TableSpec): DataFrame = {
    val renamed = renameCols(df, spec.renames)
    val converted = spec.conversions.foldLeft(renamed)(applyConversion)
    dropCols(converted, spec.removals)
  }

  private def applyConversion(df: DataFrame, c: ColumnSpec): DataFrame = {
    def schema: DataType = DataType.fromDDL(c.schemaDdl.getOrElse(
      throw new IllegalArgumentException(
        s"convertTo:${c.convertTo.get} for '${c.name}' needs a 'schema' DDL " +
        "(the reference parses schemalessly; Spark wants the struct shape)")))
    c.convertTo.get match {
      case "object" => convertObject(df, c.name, schema)
      case "list" => convertList(df, c.name, schema)
      case "map" => convertMap(df, c.name, schema)
      case "timestamp" =>
        convertTimestamp(df, c.name, c.timestampFormat.getOrElse(DefaultTimestampFormat))
      case t if t.startsWith("template:") =>
        convertTemplate(df, c.name, t.stripPrefix("template:"))
      case other =>
        throw new IllegalArgumentException(s"unknown convertTo '$other' for '${c.name}'")
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `%`-format named-placeholder render templates, compiled to
  * a single `concat` expression (codegen'd — no UDF, no per-row format-string
  * parsing).
  *
  * Reference usage (`/root/reference/wadlabs/hub/migration/`): Kafka message
  * body/key/headers (`kafkaworker.py:62-63,180-187`), S3 object key/body
  * (`s3worker.py:19-23`), RDS INSERT SQL (`rdsworker.py:35`), JSON-file line
  * (`jsonworker.py:34-37`). Placeholders are `%(field)s` / `%(field)d`;
  * `%%` is a literal percent; `[DQ]` unescapes to `"` (config-file escape,
  * `app.py:497,524`).
  */
object Templates {

  private val Placeholder = """%\(([^)]+)\)[sd]""".r
  private val PctSentinel = "\uE000"  // private-use char: cannot occur in template text

  /** Unescape the config-file form: `[DQ]` -> `"`. */
  def unescape(template: String): String = template.replace("[DQ]", "\"")

  /** Compile a template to a Column. A NULL field would poison `concat`
    * (NULL-propagating), so each placeholder is coalesced to "". */
  def render(template: String, colFor: String => Column = col): Column = {
    val t = unescape(template).replace("%%", PctSentinel)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Placeholder.findAllMatchIn(t)) {
      if (m.start > last) parts += lit(restorePct(t.substring(last, m.start)))
      parts += coalesce(colFor(m.group(1)).cast("string"), lit(""))
      last = m.end
    }
    if (last < t.length) parts += lit(restorePct(t.substring(last)))
    if (parts.isEmpty) lit("")
    else if (parts.size == 1) parts.head.cast("string")
    else concat(parts.toSeq: _*)
  }

  /** Field names referenced by a template (for dependency checks). */
  def fields(template: String): Seq[String] =
    Placeholder.findAllMatchIn(unescape(template)).map(_.group(1)).toSeq

  private def restorePct(s: String): String = s.replace(PctSentinel, "%")
}

package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of a numeric-array embedding as ONE native
  * expression: `struct(q array<tinyint>, scale double)` where
  * scale = 127 / max|v| (0 for the zero vector) and
  * q[i] = floor(v[i] * scale + 0.5).
  *
  * Arithmetic is written as floor(x + 0.5), not round(): floor is computed
  * identically by every engine, so the DuckDB gate recomputes each byte
  * exactly. The equivalent HigherOrderFunction composition
  * (`array_max(transform(...))` + `transform(...)`) is interpreted
  * per-element per-row and never constant-folded; this expression is two
  * tight loops per row. NULL elements or empty arrays yield NULL (a
  * malformed embedding should not silently quantize).
  */
case class QuantizeInt8(child: Expression)
  extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  /** Reference-object codegen (the result can be NULL mid-eval — empty or
    * null-element arrays — so the generated code re-checks isNull after
    * the call): stays inside the whole-stage span, dispatches to
    * [[compute]], the same body nullSafeEval uses. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val isFloat = elemType == FloatType
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0) 127.0 / maxAbs else 0.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = math.floor(v * scale + 0.5).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(q), scale))
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def apply(c: Column): Column =
    GraftSql.column(QuantizeInt8(GraftSql.expression(c)))
}

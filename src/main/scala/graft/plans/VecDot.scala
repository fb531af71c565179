package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-order dot product of two numeric-array columns, in double —
  * a native replacement for `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * (acc,v) -> acc+v)`.
  *
  * Semantics are bit-for-bit identical to that HOF composition (left-to-right
  * double accumulation, each element cast to double first), which is what
  * the DuckDB `list_reduce` oracle mirrors — so swapping the implementation
  * cannot change any query result. The HOF form allocates an intermediate
  * array and interprets two lambdas per element; this is one tight loop over
  * the underlying ArrayData, and similarity scans are exactly the hot path
  * where that matters (k dot products per row for LSH, one per pair for
  * near-dup joins).
  *
  * NULL semantics match the HOF form exactly: a length mismatch or a NULL
  * element yields NULL (`zip_with` pads the shorter array with nulls and a
  * null product poisons the `aggregate` fold), so swapping either
  * implementation in cannot change any query result.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (arrB.numElements() != n) return null
    val ta = elemType(left)
    val tb = elemType(right)
    var acc = 0.0
    var i = 0
    (ta, tb) match {
      case (FloatType, FloatType) =>
        while (i < n) {
          if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
          acc += arrA.getFloat(i).toDouble * arrB.getFloat(i).toDouble; i += 1
        }
      case (DoubleType, DoubleType) =>
        while (i < n) {
          if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
          acc += arrA.getDouble(i) * arrB.getDouble(i); i += 1
        }
      case (FloatType, DoubleType) =>
        while (i < n) {
          if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
          acc += arrA.getFloat(i).toDouble * arrB.getDouble(i); i += 1
        }
      case (DoubleType, FloatType) =>
        while (i < n) {
          if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
          acc += arrA.getDouble(i) * arrB.getFloat(i).toDouble; i += 1
        }
      case _ =>
        while (i < n) {
          if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
          acc += numeric(arrA, ta, i) * numeric(arrB, tb, i); i += 1
        }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      val n = ctx.freshName("vdN")
      val i = ctx.freshName("vdI")
      val acc = ctx.freshName("vdAcc")
      val va = CodeGenerator.getValue(a, elemType(left), i)
      val vb = CodeGenerator.getValue(b, elemType(right), i)
      // same sequential double fold as the interpreted path — bit-identical
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $va) * ((double) $vb);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  private def numeric(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case other => throw new IllegalArgumentException(
      s"vec_dot: unsupported element type $other")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    GraftSql.column(VecDot(GraftSql.expression(a), GraftSql.expression(b)))
}

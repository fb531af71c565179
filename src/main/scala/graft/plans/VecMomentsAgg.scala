package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** First and second raw moments of a numeric-array column in ONE pass, as
  * exact integers: each component is quantized to MILLI-units
  * (`floor(x·10³ + 0.5)` on its double widening) at the row, then
  * `n`, `Σ q_i`, and the upper-triangle `Σ q_i·q_j` accumulate as plain
  * long additions — associative, so any partition/merge order yields the
  * same buffer bit-for-bit (where raw double sums would drift by merge
  * order). This is the input [[graft.functions.PCA]] needs: covariance is
  * a d×d DRIVER-side matrix (d² longs — metadata at any corpus size), and
  * the whole corpus contributes through this single partial-aggregable
  * scan with no shuffle beyond one buffer per partition.
  *
  * Headroom: |x| ≤ 8 quantizes to ≤ 8·10³, a product is ≤ 6.4·10⁷, so the
  * long accumulator holds ~1.4·10¹¹ rows before overflow — beyond that,
  * shard the aggregation (group by a hash slice, merge the dozen buffers
  * on the driver in BigInt) — the quantization, not the arithmetic, stays
  * the contract.
  *
  * Buffer layout: [n, s_0..s_{d-1}, p_00, p_01, .., p_0(d-1), p_11, ..] —
  * `1 + d + d(d+1)/2` longs (d = 64 → ~17 KB).
  */
case class VecMomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val nTri = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + nTri

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val q = new Array[Long](dim)
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      var i = 0
      while (i < dim) {
        val x = elemType match {
          case FloatType => arr.getFloat(i).toDouble
          case DoubleType => arr.getDouble(i)
          case _ => arr.get(i, elemType).toString.toDouble
        }
        q(i) = math.floor(x * 1e3 + 0.5).toLong
        i += 1
      }
      buf(0) += 1L
      i = 0
      var t = 1 + dim
      while (i < dim) {
        buf(1 + i) += q(i)
        var j = i
        while (j < dim) {
          buf(t) += q(i) * q(j)
          t += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMomentsAgg =
    copy(child = newChild)
}

object VecMomentsAgg {
  /** Aggregate Column: the flat [n | sums | upper-tri products] long array
    * over a numeric-array column of width `dim`. */
  def apply(vec: Column, dim: Int): Column =
    GraftSql.column(VecMomentsAgg(GraftSql.expression(vec), dim)
      .toAggregateExpression())
}

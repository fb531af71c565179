package graft.plans

import java.nio.ByteBuffer

import graft.functions.Dedup
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom TypedImperativeAggregate: one mutable
  * buffer of `numHashes` minima updated per input shingle.
  *
  * The relational formulation (`Dedup.minhashSignatures`) computes the same
  * thing as numHashes separate `min()` aggregates — numHashes aggregate
  * buffers, each re-evaluating its affine expression. This aggregate hashes
  * the shingle ONCE per row and updates all minima in a tight loop, with
  * elementwise-min merge — the shape a sketch aggregate should have at
  * scale (HLL, KLL, and friends all follow this template), and graft's
  * exercise of the TypedImperativeAggregate extension point.
  *
  * Bit-identical to the relational form by construction (same xxhash64 seed,
  * same coefficients, same mod-prime arithmetic as `pmod`) — pinned by test.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val p = Dedup.MinhashPrime
  private val coeffs = Dedup.minhashCoeffs(numHashes).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      val h = ((raw % p) + p) % p // pmod
      var i = 0
      while (i < numHashes) {
        val (a, b) = coeffs(i)
        val hv = (a * h + b) % p // a,b,h >= 0 -> already non-negative
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Aggregate Column: minhash signature (array of numHashes longs) over a
    * grouped shingle column. */
  def apply(shingle: Column, numHashes: Int): Column =
    GraftSql.column(MinHashAgg(GraftSql.expression(shingle), numHashes)
      .toAggregateExpression())
}

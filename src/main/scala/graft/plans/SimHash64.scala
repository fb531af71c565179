package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}

import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as ONE narrow expression.
  *
  * Definition (matches the relational form in `graft.functions.Dedup`):
  * bit j of the result is 1 iff sum over *distinct* tokens of
  * (+1 if bit j of h(token) else -1) is > 0, where h(token) is the first 8
  * bytes of md5(token) read big-endian (= the first 16 hex chars of the
  * standard md5 hex digest). md5 rather than xxhash64 on purpose: both are
  * uniform enough for simhash (Charikar's construction only needs
  * per-bit-independent token hashes), but md5 is computable by any SQL
  * engine — which lets the DuckDB correctness gate recompute every signature
  * from scratch instead of trusting this implementation.
  *
  * Why an expression: the relational formulation is explode -> groupBy(doc)
  * with 64 aggregates — a shuffle whose input is every (doc, token) pair,
  * i.e. ~10x the corpus. SimHash is a pure per-document function, so at
  * 100 TB it should be a map fused into the scan, shuffling nothing. This
  * expression is that map.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  /** Static-invoke codegen (same pattern as [[WinnowSelect]]): the call
    * stays inside the whole-stage span; the loop runs as JIT-compiled
    * Scala shared with the interpreted path. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash64$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(c)))

  /** MessageDigest is stateful and not thread-safe — one per task thread. */
  private[plans] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** One pass over the document; called from both eval paths. */
  def compute(input: UTF8String): Long = {
    // tokenize on the raw UTF-8 bytes: 0x20 can only be the space character
    // (multibyte sequences are all >= 0x80), so byte-splitting == the
    // string split, with zero per-token String/substring allocation; token
    // dedup keys on ByteBuffer views (content-based equals/hashCode)
    val bytes = input.getBytes
    val md = localMd5.get()
    val counts = new Array[Int](64)
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    var start = 0
    val n = bytes.length
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (seen.add(java.nio.ByteBuffer.wrap(bytes, start, i - start))) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          var h = 0L
          var k = 0
          while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** fastText-style linear-classifier score of a token array as ONE narrow
  * JIT-compiled pass — the inference hot loop of
  * `graft.functions.Classifier` (hashed unigram+bigram features, md5
  * bucket, per-bucket micronat weight, exact long fold):
  *
  *   score = Σ_tok w(b(tok)) + Σ_i w(b(tok_i + " " + tok_{i+1}))
  *   b(f)  = slice32(md5(f)) mod dim,   slice32 = last 4 digest bytes
  *   w(b)  = slice32(md5("qw42#" + b)) mod 2001 − 1000
  *
  * Bit-exact to the HOF form `scoreExpr(featuresExpr(toks), dim)` with
  * the default weight table (same md5, same unsigned 32-bit slice —
  * `conv(substring(md5(f), 25, 8), 16, 10)` reads exactly the last four
  * digest bytes big-endian — and long addition is associative, so the
  * fused unigram/bigram order cannot change the sum); parity pinned
  * element-for-element in ClassifierSpec. Custom trained weight tables
  * keep the pluggable HOF path (`Classifier.scoreExpr(weightExpr = …)`).
  *
  * Why an expression: the HOF chain is evaluated interpreted and
  * materializes every bigram STRING; under the honest bench action it
  * priced quality_classifier / quality_filter_chain at ~1.7 s each at
  * sf0.1. Here the `dim`-entry weight table is computed once per JVM and
  * the per-feature work is one md5 over reused buffers — no feature
  * array, no per-bigram String allocation. */
case class LinearScore(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, "dim must be positive")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    LinearScore.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LinearScore$$.MODULE$$.compute($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): LinearScore =
    copy(child = newChild)
}

object LinearScore {
  def apply(c: Column, dim: Int): Column =
    GraftSql.column(LinearScore(GraftSql.expression(c), dim))

  /** Unsigned value of the last four md5 digest bytes — exactly
    * `conv(substring(md5(s), 25, 8), 16, 10)`. */
  private def slice32(d: Array[Byte]): Long =
    ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
      ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)

  /** Per-dim weight tables, computed once per JVM (model metadata:
    * `dim` longs). Values replicate `Classifier.hashWeight` bit-for-bit:
    * the oracle recomputes them independently in SQL. */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private[graft] def weights(dim: Int): Array[Long] =
    tables.computeIfAbsent(dim, d => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate[Long](d) { b =>
        md.reset()
        slice32(md.digest(s"qw42#$b".getBytes("UTF-8"))) % 2001L - 1000L
      }
    })

  /** One pass over the token array; called from both eval paths. Null
    * array elements cannot occur on the split() outputs this scores
    * (and would have nulled the HOF fold); they contribute weight of
    * the empty feature here, fail-soft. */
  def compute(arr: ArrayData, dim: Int): Long = {
    val w = weights(dim)
    val md = SimHash64.localMd5.get()
    val n = arr.numElements()
    var score = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val bytes = if (t == null) Array.emptyByteArray else t.getBytes
      md.reset()
      md.update(bytes)
      score += w((slice32(md.digest()) % dim).toInt)
      if (prev != null) {
        md.reset()
        md.update(prev)
        md.update(' '.toByte)
        md.update(bytes)
        score += w((slice32(md.digest()) % dim).toInt)
      }
      prev = bytes
      i += 1
    }
    score
  }
}

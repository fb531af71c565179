package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as ONE narrow expression.
  *
  * Definition (matches the relational form in `graft.functions.Dedup`):
  * bit j of the result is 1 iff sum over *distinct* tokens of
  * (+1 if bit j of xxhash64(token) else -1) is > 0. Token hashes use
  * Spark's own XxHash64Function with the `xxhash64()` default seed (42), so
  * this expression and the explode/groupBy formulation produce identical
  * hashes.
  *
  * Why an expression: the relational formulation is explode -> groupBy(doc)
  * with 64 aggregates — a shuffle whose input is every (doc, token) pair,
  * i.e. ~10x the corpus. SimHash is a pure per-document function, so at
  * 100 TB it should be a map fused into the scan, shuffling nothing. This
  * expression is that map.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          val h = XxHash64Function.hash(
            UTF8String.fromString(tok), StringType, 42L)
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

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(c)))
}

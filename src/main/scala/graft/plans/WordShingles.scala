package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a whitespace-tokenized string, as a single
  * native expression.
  *
  * The composable form — `array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', slice(split(text,' '), i+1, k))))` — is semantically
  * identical but evaluates as interpreted HigherOrderFunctions, and the
  * loop-invariant `split` subtree is re-evaluated per element (HOF lambdas
  * don't hoist). One native pass tokenizes once and builds the distinct set
  * directly; on the dedup pipeline this is the difference between the
  * shingle stage dominating and disappearing.
  *
  * Semantics match `split(text, ' ', -1)` (trailing empties kept) and
  * first-occurrence-order distinct — the same contract as the HOF form and
  * the DuckDB `string_split`/`list_distinct` oracle. Documents shorter than
  * k words contribute their full text as the single shingle.
  */
case class WordShingles(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Static-invoke codegen (same pattern as [[WinnowSelect]]): k is a
    * plan-time constant, inlined into the generated call. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingles$$.MODULE$$.compute($c, $k);")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, k: Int): Column =
    GraftSql.column(WordShingles(GraftSql.expression(c), k))

  /** One tokenize + distinct-set pass; called from both eval paths. */
  def compute(input: UTF8String, k: Int): GenericArrayData = {
    val s = input.toString
    val words = s.split(" ", -1)
    if (words.length < k) {
      new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    } else {
      val seen = new java.util.LinkedHashSet[String](words.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
      new GenericArrayData(out)
    }
  }
}

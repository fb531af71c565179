package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer et al. 2003) as a native
  * expression: per sliding window of `w` gram hashes, the argmin position
  * (LEFTMOST tie-break), globally deduped in first-occurrence order.
  *
  * Replaces the HOF composition `transform(sequence(1, nW), j ->
  * aggregate(sequence(j, min(j+w-1, m)), ...))` + `array_distinct`, which
  * is O(m·w) with a struct allocation per compared element AND interpreted
  * (higher-order functions are CodegenFallback in Spark). This is one
  * O(m) monotonic-deque pass per document — the classic sliding-window
  * minimum. Semantics are element-for-element identical:
  *  - windows are [j, min(j+w-1, m)] for j = 1..max(m-w+1, 1) (1-based),
  *    the same clipped single window when m < w;
  *  - the deque evicts from the back only on STRICTLY greater hashes, so
  *    among equal minima the earliest (leftmost) index stays at the front —
  *    exactly the `hs[i] < acc.h` strict comparison of the fold;
  *  - results dedupe globally in first-occurrence order, exactly
  *    `array_distinct`'s contract (same pos implies same hash, so deduping
  *    by position equals deduping by the struct).
  * The DuckDB oracle (`winnow_fingerprints` / `winnow_overlap_pairs` /
  * `dedup_edit_verify`) recomputes the fold form and must keep matching.
  *
  * Output: array<struct<p int, h long>> (1-based position, selected hash).
  */
case class WinnowSelect(child: Expression, w: Int)
  extends UnaryExpression {

  require(w >= 1, "window must be >= 1")

  // analysis-time input check: array<long> only (array<int> would reach
  // ArrayData.getLong and die with an opaque ClassCastException mid-task)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[ArrayData], w)

  /** Codegen via static invoke (the StaticInvoke pattern): the generated
    * call keeps this expression INSIDE the whole-stage-codegen span — no
    * interpreted-eval boundary, no per-row InternalRow materialization —
    * while the deque loop itself runs as JIT-compiled Scala in
    * [[WinnowSelect.select]] (the same body nullSafeEval uses, so the
    * CodegenFallback-era semantics are preserved by construction). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowSelect$$.MODULE$$.select($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowSelect {
  def apply(c: Column, w: Int): Column =
    GraftSql.column(WinnowSelect(GraftSql.expression(c), w))

  /** One O(m) monotonic-deque pass; see the class doc for the
    * window/tie-break/dedupe contract. Called from both the interpreted
    * path and the generated code. */
  def select(hs: ArrayData, w: Int): ArrayData = {
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val nW = math.max(m - w + 1, 1)
    // monotonic deque of 0-based indices; hashes non-decreasing front->back
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[Integer]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](nW)
    var i = 0
    var j = 0 // 0-based window start
    while (j < nW) {
      val windowEnd = math.min(j + w - 1, m - 1) // inclusive, clipped
      // admit new elements up to the window end
      while (i <= windowEnd) {
        val h = hs.getLong(i)
        while (tail > head && hs.getLong(deque(tail - 1)) > h) tail -= 1
        deque(tail) = i
        tail += 1
        i += 1
      }
      // retire indices before the window start
      while (head < tail && deque(head) < j) head += 1
      val sel = deque(head)
      if (seen.add(sel)) {
        out += new GenericInternalRow(
          Array[Any](sel + 1, hs.getLong(sel))): Unit
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

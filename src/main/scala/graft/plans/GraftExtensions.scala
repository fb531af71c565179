package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions so `spark.sql("SELECT rolling_hash(text), ...")` works
  * anywhere — the extension seam a deployed library ships
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      rollingHashBuilder))
    e.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      wordShinglesBuilder))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simHashBuilder))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      vecDotBuilder))
    e.injectFunction((
      new FunctionIdentifier("multi_substring_count"),
      new ExpressionInfo(classOf[MultiSubstringCount].getName,
        "multi_substring_count"),
      multiSubstringBuilder))
    e.injectFunction((
      new FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      winnowSelectBuilder))
    // the custom-operator strategy rides the same extension entry point, so
    // a session built with spark.sql.extensions=graft.plans.GraftExtensions
    // plans TopKPerKey nodes without any runtime registration
    e.injectPlannerStrategy(_ => TopKStrategy)
    // and the optimizer rewrite that routes USER-written window top-k
    // (filter(row_number().over(...) <= k)) onto that operator
    e.injectOptimizerRule(_ => TopKRewrite)
  }
}

object GraftExtensions {

  val rollingHashBuilder: Seq[Expression] => Expression = {
    case Seq(c) => RollingHash(c)
    case Seq(c, b, m) => RollingHash(c,
      b.eval().asInstanceOf[Number].longValue(),
      m.eval().asInstanceOf[Number].longValue())
    case _ => throw new IllegalArgumentException("rolling_hash(str[, base, mod])")
  }

  val wordShinglesBuilder: Seq[Expression] => Expression = {
    case Seq(c, k) => WordShingles(c, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException("word_shingles(str, k)")
  }

  val simHashBuilder: Seq[Expression] => Expression = {
    case Seq(c) => SimHash64(c)
    case _ => throw new IllegalArgumentException("simhash64(str)")
  }

  val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDot(a, b)
    case _ => throw new IllegalArgumentException("vec_dot(arr, arr)")
  }

  /** Patterns as string literals: `multi_substring_count(text, 'a', 'b')`. */
  val multiSubstringBuilder: Seq[Expression] => Expression = {
    case exprs if exprs.size >= 2 =>
      MultiSubstringCount(exprs.head,
        exprs.tail.map(_.eval().toString))
    case _ => throw new IllegalArgumentException(
      "multi_substring_count(str, pattern[, pattern...])")
  }

  val winnowSelectBuilder: Seq[Expression] => Expression = {
    case Seq(c, w) =>
      // the window must be a literal: it parameterizes the expression, it
      // is not a per-row input. Validate here for a clear analysis-time
      // error instead of an opaque eval()-on-unbound failure
      val integral = w.dataType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      if (!w.foldable || !integral)
        throw new IllegalArgumentException(
          "winnow_select: window must be an integral literal")
      WinnowSelect(c, w.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "winnow_select(array<long>, window)")
  }

  /** Runtime registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftSql.registerFunction(spark, "rolling_hash", rollingHashBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(spark, "word_shingles", wordShinglesBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(spark, "simhash64", simHashBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(spark, "vec_dot", vecDotBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(spark, "multi_substring_count", multiSubstringBuilder)
    org.apache.spark.sql.GraftSql.registerFunction(spark, "winnow_select", winnowSelectBuilder)
  }
}

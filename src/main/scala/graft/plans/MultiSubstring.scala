package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton: counts EVERY occurrence of every pattern
  * (overlaps included — each (pattern, end-position) match counts once),
  * one state transition per input char regardless of pattern count. This
  * is the structure substring blocklists need at scale: a 100k-entry URL
  * or phrase list costs O(text length) per row where naive
  * `contains`-per-pattern is O(patterns × length) and regex alternation
  * blows up the NFA. Built once on the driver, shipped as a codegen
  * reference object — one automaton per executor, shared by every row. */
class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie over chars; goto as per-node HashMap (pattern alphabets are tiny
  // relative to a dense table over Char)
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val ends = scala.collection.mutable.ArrayBuffer(0)
  patterns.foreach { p =>
    var st = 0
    p.foreach { ch =>
      val next = gotoMaps(st).get(ch)
      st = if (next != null) next.intValue()
      else {
        gotoMaps += new java.util.HashMap[Character, Integer]()
        ends += 0
        gotoMaps(st).put(ch, gotoMaps.size - 1)
        gotoMaps.size - 1
      }
    }
    ends(st) += 1
  }
  private val n = gotoMaps.size
  private val fail = new Array[Int](n)
  // outCount(s) = patterns ending at s OR at any suffix-link ancestor
  private val outCount = new Array[Int](n)
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    outCount(0) = ends(0)
    gotoMaps(0).forEach { (_, v) =>
      fail(v) = 0; queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outCount(u) = ends(u) + outCount(fail(u))
      gotoMaps(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(ch) == null) f = fail(f)
        val next = gotoMaps(f).get(ch)
        fail(v) = if (next != null && next.intValue() != v.intValue())
          next.intValue() else 0
        queue.add(v)
      }
    }
  }

  /** Total (pattern, end-position) matches in `s`, overlaps included. */
  def countAll(s: String): Int = {
    var st = 0
    var c = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var next = gotoMaps(st).get(ch)
      while (next == null && st != 0) { st = fail(st); next = gotoMaps(st).get(ch) }
      st = if (next != null) next.intValue() else 0
      c += outCount(st)
      i += 1
    }
    c
  }
}

/** Native expression: total blocklist-substring occurrences in a string
  * column. The automaton rides into generated code as a reference object,
  * so the per-row cost is one virtual call inside whole-stage codegen —
  * no regex, no per-pattern scan, no UDF serialization. */
case class MultiSubstringCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  @transient private lazy val matcher = new AhoCorasick(patterns)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "multi_substring_count"

  override protected def nullSafeEval(input: Any): Any =
    matcher.countAll(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("acMatcher", matcher,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$m.countAll($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression):
      MultiSubstringCount = copy(child = newChild)
}

object MultiSubstringCount {
  def apply(text: Column, patterns: Seq[String]): Column =
    GraftSql.column(MultiSubstringCount(GraftSql.expression(text), patterns))
}

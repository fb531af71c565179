package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Translator for the reference's `convertTo: "template:<expr>"` computed
  * columns — its only user-extensible scalar compute hook.
  *
  * The reference evaluates the expression with Python `eval` restricted to
  * builtins `int` and `str` plus locals `row`/`conf`/`col`/`wt`/`wid`
  * (`/root/reference/wadlabs/hub/migration/worker.py:11,149-150`). The
  * observed/documented shape is string and integer arithmetic over row
  * fields, e.g. `str(row['amount']) + '-' + row['name']`.
  *
  * We re-host exactly that shape as a Catalyst expression tree (codegen'd,
  * no UDF): `row['x']` -> column ref, `str(e)` -> cast to string, `int(e)` ->
  * cast to long, `+` -> `concat` when either side is string-typed (Python
  * requires explicit `str()` around non-strings, so the static string hint is
  * faithful), arithmetic otherwise. Arbitrary Python is an explicit non-goal
  * (SURVEY.md §7 risk register).
  */
object TemplateExpr {

  def column(pyExpr: String): Column = new Parser(pyExpr).parseAll().col

  private sealed trait Hint
  private case object StrHint extends Hint
  private case object NumHint extends Hint
  private case object UnknownHint extends Hint

  private final case class Typed(col: Column, hint: Hint)

  private final class Parser(s: String) {
    private var i = 0

    def parseAll(): Typed = {
      val e = parseExpr()
      skipWs()
      require(i >= s.length, s"trailing input at $i in template expr: $s")
      e
    }

    private def parseExpr(): Typed = {
      var left = parseTerm()
      skipWs()
      while (i < s.length && "+-*/".contains(s(i))) {
        val op = s(i); i += 1
        val right = parseTerm()
        left = combine(op, left, right)
        skipWs()
      }
      left
    }

    private def combine(op: Char, l: Typed, r: Typed): Typed = op match {
      case '+' if l.hint == StrHint || r.hint == StrHint =>
        Typed(concat(l.col.cast("string"), r.col.cast("string")), StrHint)
      case '+' => Typed(l.col + r.col, NumHint)
      case '-' => Typed(l.col - r.col, NumHint)
      case '*' => Typed(l.col * r.col, NumHint)
      case '/' => Typed(l.col / r.col, NumHint)
    }

    private def parseTerm(): Typed = {
      skipWs()
      if (eat("str(")) { val e = parseExpr(); expect(')'); Typed(e.col.cast("string"), StrHint) }
      else if (eat("int(")) { val e = parseExpr(); expect(')'); Typed(e.col.cast("long"), NumHint) }
      else if (eat("row[")) {
        val q = s(i); require(q == '\'' || q == '"', s"expected quote at $i in: $s")
        i += 1
        val end = s.indexOf(q, i)
        val name = s.substring(i, end); i = end + 1
        expect(']')
        Typed(col(name), UnknownHint)
      }
      else if (s(i) == '\'' || s(i) == '"') {
        val q = s(i); i += 1
        val end = s.indexOf(q, i)
        val v = s.substring(i, end); i = end + 1
        Typed(lit(v), StrHint)
      }
      else if (s(i) == '(') { i += 1; val e = parseExpr(); expect(')'); e }
      else {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        require(i > start, s"unparsable template term at $start in: $s")
        val tok = s.substring(start, i)
        if (tok.contains('.')) Typed(lit(tok.toDouble), NumHint)
        else Typed(lit(tok.toLong), NumHint)
      }
    }

    private def skipWs(): Unit = while (i < s.length && s(i) == ' ') i += 1
    private def eat(tok: String): Boolean = {
      skipWs()
      if (s.startsWith(tok, i)) { i += tok.length; true } else false
    }
    private def expect(c: Char): Unit = {
      skipWs()
      require(i < s.length && s(i) == c, s"expected '$c' at $i in: $s")
      i += 1
    }
  }
}

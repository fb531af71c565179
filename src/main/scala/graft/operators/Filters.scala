package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate operators.
  *
  *  - `filter_solr`: the reference pushes a Solr/Lucene query string into
  *    `WHERE solr_query='{"q":"<filter>"}'` (DSE Search,
  *    `/root/reference/wadlabs/hub/migration/datacrawler.py:138-151`). We
  *    translate the query surface to Catalyst predicates so the parquet (or
  *    Cassandra-connector) scan gets real pushdown: `*:*` -> true,
  *    `field:value` -> equality, `field:[a TO b]` -> inclusive range (with
  *    `*` as an open bound), `field:pre*` -> prefix LIKE, and
  *    `AND`/`OR`/`NOT`/parentheses.
  *  - `filter_modified_ts`: the incremental high-watermark. Rows whose
  *    `modified_timestamp >= watermark` are dropped — i.e. rows touched after
  *    extraction began (`worker.py:194-198`; watermark capture
  *    `datacrawler.py:486-491`). Boundary is `>= excluded`.
  *
  * Both compile to scan-level pushed filters — `.explain` shows them in
  * `PushedFilters`, which is what keeps a 100 TB scan from reading cold
  * row groups.
  */
object Filters {

  /** filter_modified_ts: keep rows strictly before the watermark; rows with a
    * NULL timestamp pass (the reference only filters when the field is
    * present, `worker.py:195`). `tsMillis` must already be epoch millis —
    * compose with [[Transforms.timestampMillis]] for string columns.
    */
  def watermark(df: DataFrame, tsMillisCol: Column, watermarkMillis: Long): DataFrame =
    df.filter(tsMillisCol.isNull || tsMillisCol < lit(watermarkMillis))

  /** filter_solr: parse a Lucene-ish query into a Column predicate. */
  def solr(df: DataFrame, query: String): DataFrame = df.filter(solrPredicate(query))

  def solrPredicate(query: String): Column = new SolrParser(query).parseAll()

  /** Minimal Lucene query parser covering the surface the reference's
    * `--filter` exposes (README.md:280-283 shows `*:*` and field queries).
    * Grammar: or := and ('OR' and)*; and := unary ('AND' unary)*;
    * unary := 'NOT' unary | '(' or ')' | clause;
    * clause := field ':' (range | prefix | term).
    */
  private final class SolrParser(s: String) {
    private var i = 0

    def parseAll(): Column = {
      val c = parseOr()
      skipWs()
      require(i >= s.length, s"trailing input at $i in solr query: $s")
      c
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (eatWord("OR")) left = left || parseAnd()
      left
    }

    private def parseAnd(): Column = {
      var left = parseUnary()
      while (eatWord("AND")) left = left && parseUnary()
      left
    }

    private def parseUnary(): Column = {
      skipWs()
      if (eatWord("NOT")) !parseUnary()
      else if (peek == '(') { i += 1; val c = parseOr(); expect(')'); c }
      else parseClause()
    }

    private def parseClause(): Column = {
      skipWs()
      val field = readUntil(':')
      expect(':')
      // a dangling operator or missing clause would otherwise swallow the
      // following text into a bogus field name — malformed input must
      // throw, never mis-parse
      require(field.nonEmpty && !field.exists(_.isWhitespace),
        s"invalid field name '$field' in solr query: $s")
      if (field == "*" ) { readTerm(); lit(true) } // *:* match-all
      else if (peek == '[') parseRange(field)
      else if (peek == '(') parseFieldGroup(field)
      else {
        val term = readTerm()
        require(term.nonEmpty, s"empty term for field '$field' in: $s")
        termPredicate(field, term)
      }
    }

    /** Lucene field grouping: `field:(a b c)` / `field:(a OR b)` — the terms
      * OR over the one field. */
    private def parseFieldGroup(field: String): Column = {
      expect('(')
      var acc: Column = null
      while (peek != ')') {
        if (!eatWord("OR")) () // bare whitespace between terms is implicit OR
        val t = readTerm()
        if (t.nonEmpty) {
          val p = termPredicate(field, t)
          acc = if (acc == null) p else acc || p
        }
      }
      expect(')')
      require(acc != null, s"empty field group for '$field' in: $s")
      acc
    }

    private def termPredicate(field: String, term: String): Column =
      if (term == "*") col(field).isNotNull
      else if (term.endsWith("*")) col(field).startsWith(term.dropRight(1))
      else col(field) === lit(term)

    private def parseRange(field: String): Column = {
      expect('[')
      val lo = readUntilWord("TO").trim
      eatWord("TO")
      val hi = readUntil(']').trim
      expect(']')
      val loC = if (lo == "*") lit(true) else col(field) >= lit(lo)
      val hiC = if (hi == "*") lit(true) else col(field) <= lit(hi)
      loC && hiC
    }

    private def peek: Char = { skipWs(); if (i < s.length) s(i) else '\u0000' }
    private def skipWs(): Unit = while (i < s.length && s(i) == ' ') i += 1
    private def expect(c: Char): Unit = {
      skipWs(); require(i < s.length && s(i) == c, s"expected '$c' at $i in: $s"); i += 1
    }
    private def eatWord(w: String): Boolean = {
      skipWs()
      if (s.startsWith(w, i) &&
          (i + w.length >= s.length || !s(i + w.length).isLetter)) {
        i += w.length; true
      } else false
    }
    private def readUntil(c: Char): String = {
      skipWs()
      val start = i
      while (i < s.length && s(i) != c) i += 1
      s.substring(start, i).trim
    }
    private def readUntilWord(w: String): String = {
      skipWs()
      val start = i
      while (i < s.length && !s.startsWith(s" $w ", i - 1)) i += 1
      s.substring(start, i)
    }
    private def readTerm(): String = {
      skipWs()
      val start = i
      if (i < s.length && (s(i) == '"' || s(i) == '\'')) {
        val q = s(i); i += 1
        val end = s.indexOf(q, i)
        val v = s.substring(i, end); i = end + 1
        v
      } else {
        while (i < s.length && !" ()".contains(s(i))) i += 1
        s.substring(start, i)
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-cleaning transforms for training-data pipelines: PII redaction and
  * markup stripping.
  *
  * Both are narrow per-row `regexp_replace` chains — codegen'd, zero
  * shuffle, embarrassingly parallel at 100 TB. The patterns stay within the
  * common subset of Java regex and RE2 (character classes and bounded
  * quantifiers, no backreferences or lookaround) so the same pattern text
  * is portable across engines — which is also what lets the DuckDB oracle
  * recompute the exact output.
  *
  * The reference engine has no scrubbing stage (its `datacrawler.py`
  * forwards extracted rows as-is); these are part of the training-data
  * extension surface.
  */
object TextClean {

  /** Email addresses: local part, @, dotted domain, 2+ letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like digit runs: optional +, 7+ digits allowing dashes. */
  val PhonePattern = "\\+?[0-9][0-9-]{5,}[0-9]"

  /** SGML/HTML tags (non-greedy by construction: `[^>]*` cannot cross a
    * closing bracket). */
  val TagPattern = "<[^>]*>"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "[EMAIL]")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, "[PHONE]")

  /** Full PII scrub. Emails first — their local parts may contain digit
    * runs that would otherwise half-match the phone pattern. */
  def redactPii(text: Column): Column = redactPhones(redactEmails(text))

  def countEmails(text: Column): Column =
    regexp_count(text, lit(EmailPattern))

  def countPhones(text: Column): Column =
    regexp_count(text, lit(PhonePattern))

  /** Remove markup tags entirely (no space inserted: `<b>word</b>` was one
    * word in the source). */
  def stripTags(html: Column): Column =
    regexp_replace(html, TagPattern, "")

  /** Strip tags, then collapse runs of spaces and trim — the standard
    * HTML-to-text normalization step before tokenizing. */
  def stripMarkup(html: Column): Column =
    trim(regexp_replace(stripTags(html), " +", " "))

  /** Whole-token blocklist OCCURRENCE count (C4's badwords filter, Raffel
    * et al. 2020 §2.2 — pages containing any listed word are dropped):
    * counts every occurrence, not distinct matches, so downstream policies
    * can threshold on density too. Pure narrow expression — the blocklist
    * ships as plan literals (these lists are hundreds to thousands of
    * entries — metadata). */
  def blocklistHits(text: Column, terms: Seq[String]): Column =
    size(filter(split(text, " "), t => t.isin(terms: _*)))

  /** Per-document blocklist verdict: (id, n_blocklist_hits, keep). */
  def blocklistFilter(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        blocklistHits(col(textCol), terms).as("n_blocklist_hits"))
      .withColumn("keep", col("n_blocklist_hits") === 0)
}

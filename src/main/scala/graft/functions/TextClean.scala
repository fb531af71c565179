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

  /** C4's LINE-LEVEL cleaning pass (Raffel et al. 2020 §2.2) — the half
    * of C4 the whole-token blocklist ([[blocklistFilter]]) and the
    * three-sentence-span dedup (`Dedup.dedupSpans`) don't cover. C4 is a
    * TRANSFORMER, not just a verdict: it rewrites each page to its kept
    * lines, then judges the page on what survived. Per the paper:
    *
    *   - a line is RETAINED iff it ends in a terminal punctuation mark
    *     (`.` `!` `?` or a closing quote), has at least `minLineWords`
    *     words, and contains none of `dropLineSubstrings`
    *     (case-insensitive; the paper drops lines with "javascript")
    *   - the PAGE is kept iff its cleaned text has at least
    *     `minSentences` sentences (terminal-punctuation census over the
    *     kept lines) and the ORIGINAL text contains none of
    *     `dropDocSubstrings` (the paper: "lorem ipsum" placeholder text,
    *     case-insensitive, and the literal `{` that marks leaked code)
    *
    * Output: (id, n_lines, n_lines_kept, text_clean, n_sentences,
    * has_lorem_ipsum, has_brace, c4_keep) — the cleaned text rides along
    * so the funnel's next stage reads the REWRITTEN page, and the
    * per-rule counts make loss censuses one aggregation.
    *
    * Scale shape: a PURE NARROW MAP — every census is a row-local array
    * expression over the line split, no explode, no join, no shuffle;
    * the whole pass fuses into the scan. Word counting ignores empty
    * tokens (runs of spaces), so the census is whitespace-robust. */
  /** Flag-column name for a document-level drop substring (shared by
    * [[c4Clean]] and [[c4Chain]], which reads the flags back). */
  private[functions] def c4FlagName(s: String): String =
    if (s == "{") "has_brace"
    else "has_" + s.toLowerCase.map(c =>
      if (c.isLetterOrDigit) c else '_')

  def c4Clean(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minLineWords: Int = 5, minSentences: Int = 3,
      dropLineSubstrings: Seq[String] = Seq("javascript"),
      dropDocSubstrings: Seq[String] = Seq("lorem ipsum", "{"))
      : org.apache.spark.sql.DataFrame = {
    def lineKept(l: Column): Column = {
      // last-char test instead of a `$`-anchored regex: Java's `$` also
      // matches before a trailing line terminator while RE2's does not —
      // substring(-1) is identical in every engine
      val term = substring(trim(l), -1, 1).isin(".", "!", "?", "\"")
      val words = size(filter(split(l, " "), w => length(w) > 0))
      val blocked = dropLineSubstrings
        .map(s => lower(l).contains(s.toLowerCase))
        .reduceOption(_ || _).getOrElse(lit(false))
      term && words >= minLineWords && !blocked
    }
    def flagName(s: String): String = c4FlagName(s)
    val t = df.select(col(idCol), col(textCol).as("_t"),
      split(col(textCol), "\n").as("_l"))
    // the kept-line array is referenced twice (count + join); both reads
    // are O(lines) row-local so recomputation under projection collapse
    // is harmless — no persist barrier needed (contrast gopherRepetition,
    // whose folds read SORTED copies worth materializing)
    val keptArr = filter(col("_l"), lineKept(_))
    val cleaned = array_join(keptArr, "\n")
    val flags = dropDocSubstrings.map(s =>
      lower(col("_t")).contains(s.toLowerCase).as(flagName(s)))
    val nSent = (length(cleaned) -
      length(regexp_replace(cleaned, "[.!?]", ""))).cast("long")
    t.select(Seq(col(idCol), size(col("_l")).cast("long").as("n_lines"),
        size(keptArr).cast("long").as("n_lines_kept"),
        cleaned.as("text_clean"), nSent.as("n_sentences")) ++
        flags: _*)
      .withColumn("c4_keep",
        dropDocSubstrings.map(s => !col(flagName(s)))
          .foldLeft(col("n_sentences") >= minSentences)(_ && _))
  }

  /** The FULL C4 pipeline as one production chain (Raffel et al. 2020
    * §2.2 end-to-end — the [[graft.functions.TextAnalysis.gopherChain]]
    * pattern applied to C4): [[c4Clean]]'s line-level rewrite and page
    * rules, then the badwords blocklist over the CLEANED text, then the
    * three-span corpus dedup ("discard all but one of any three-sentence
    * span occurring more than once in the data set"), with first-failure
    * semantics — `first_failed` names the first rule that dropped the
    * page (NULL when kept), so per-rule loss rates are one groupBy over
    * this output. Precedence (documented, oracle-replayed):
    * too_few_sentences → lorem_ipsum → brace → badwords.
    *
    * Span unit: a span is `spanLines` CONSECUTIVE KEPT LINES of the
    * cleaned page. After [[c4Clean]] every kept line ends in terminal
    * punctuation, so a line is the engine's sentence proxy — the paper's
    * own impl dedupes "three-sentence spans" found by exactly this kind
    * of heuristic splitting (a documented divergence: multi-sentence
    * lines dedup as a unit). The census runs over KEPT pages only
    * (dropped pages cannot claim a first occurrence); the FIRST
    * occurrence corpus-wide — min (id, position), ids numeric — keeps
    * its lines (its covered indices are protected from removal by
    * OVERLAPPING occurrences of the same span in the same page, so a
    * page of n identical lines retains its first `spanLines` lines),
    * every other occurrence's lines are removed, and the page is
    * rebuilt (`final_text`, with `n_span_lines_removed` counted).
    *
    * Scale shape: the verdicts are one narrow persisted projection (the
    * gopherChain discipline); the span dedup is the Lee et al. census
    * shape — spans keyed by md5 (16-byte keys, never the 3-line text)
    * through ONE hash-keyed aggregation, duplicated occurrences join
    * back positionally, and coverage folds per document. Nothing is
    * ever all-pairs; the census key-space is corpus-sized but every
    * aggregate partial-aggregates map-side. */
  def c4Chain(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blocklist: Seq[String],
      minLineWords: Int = 5, minSentences: Int = 3,
      dropLineSubstrings: Seq[String] = Seq("javascript"),
      dropDocSubstrings: Seq[String] = Seq("lorem ipsum", "{"),
      spanLines: Int = 3): org.apache.spark.sql.DataFrame = {
    require(spanLines >= 1)
    // first_failed folds over ALL of dropDocSubstrings in order (round-16
    // advice fix: the previous form hardwired exactly two rules — a 3rd+
    // entry was silently ignored and a single-entry list referenced a
    // flag column c4Clean never created). Labels come from c4FlagName
    // minus the has_ prefix ("{" keeps its documented "brace" label), so
    // the default two-rule chain is byte-identical to the old one.
    val docRules = dropDocSubstrings.map { s =>
      (c4FlagName(s), if (s == "{") "brace"
        else c4FlagName(s).stripPrefix("has_"))
    }
    // persisted: the verdict frame feeds the span census AND the final
    // output join (without it the whole line-level pass runs twice)
    val v = Caches.operatorPersist(
      c4Clean(df, idCol, textCol, minLineWords, minSentences,
        dropLineSubstrings, dropDocSubstrings)
        .withColumn("n_blocklist_hits",
          blocklistHits(col("text_clean"), blocklist))
        .withColumn("first_failed",
          docRules.foldLeft(
              when(col("n_sentences") < minSentences,
                lit("too_few_sentences"))) {
              case (acc, (flag, label)) => acc.when(col(flag), lit(label))
            }
            .when(col("n_blocklist_hits") > 0, lit("badwords")))
        .select(col(idCol), col("n_lines"), col("n_lines_kept"),
          col("n_sentences"), col("n_blocklist_hits"),
          col("first_failed"), col("text_clean")))
    val kept = v.filter(col("first_failed").isNull)
    // span occurrences over kept pages: (id, pos, md5(span))
    val keptLines = kept.select(col(idCol),
      split(col("text_clean"), "\n").as("_kl"))
    val spans = keptLines.filter(size(col("_kl")) >= spanLines)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), size(col("_kl")) - (spanLines - 1)),
          i => md5(concat_ws("\n", slice(col("_kl"), i, lit(spanLines)))))
        ).as(Seq("_p0", "_h")))
      .select(col(idCol), (col("_p0") + 1).as("_i"), col("_h"))
    // census: occurrence count + FIRST occurrence (lexicographic
    // (id, pos) via a struct min — one hash-keyed exchange on the
    // 16-byte span key, partial-aggregated map-side)
    val census = spans.groupBy(col("_h"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col(idCol).as("_fd"), col("_i").as("_fi"))).as("_f"))
      .filter(col("_n") >= 2)
    // duplicated occurrences that are NOT the first keep nothing: their
    // covered line indices fold per document. The FIRST occurrence's own
    // covered indices are PROTECTED from removal by overlapping
    // occurrences of the same span (round-16 advice fix: a page of n
    // identical kept lines now retains its first spanLines lines, not
    // just line 1 — "the first occurrence keeps its lines" made true)
    val removedLines = spans.join(census, Seq("_h"))
      .filter(!(col(idCol) === col("_f._fd") && col("_i") === col("_f._fi")))
      .select(col(idCol), col("_f"),
        explode(sequence(col("_i"), col("_i") + (spanLines - 1))).as("_j"))
      .filter(!(col(idCol) === col("_f._fd") &&
        col("_j").between(col("_f._fi"), col("_f._fi") + (spanLines - 1))))
      .select(col(idCol), col("_j"))
      .distinct()
      .groupBy(col(idCol))
      .agg(collect_set(col("_j")).as("_cov"))
    val keptOut = kept
      .join(removedLines, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("n_lines_kept"),
        col("n_sentences"), col("n_blocklist_hits"), col("first_failed"),
        coalesce(size(col("_cov")), lit(0)).cast("int")
          .as("n_span_lines_removed"),
        when(col("_cov").isNull, col("text_clean"))
          .otherwise(array_join(filter(
            transform(split(col("text_clean"), "\n"),
              (l, i0) => when(array_contains(col("_cov"), i0 + 1), lit(null)
                .cast("string")).otherwise(l)),
            _.isNotNull), "\n")).as("final_text"))
    val failedOut = v.filter(col("first_failed").isNotNull)
      .select(col(idCol), col("n_lines"), col("n_lines_kept"),
        col("n_sentences"), col("n_blocklist_hits"), col("first_failed"),
        lit(0).as("n_span_lines_removed"),
        lit(null).cast("string").as("final_text"))
    keptOut.unionAll(failedOut)
      .withColumn("keep", col("first_failed").isNull)
  }

  /** Unicode NFC normalization (canonical composition) — the codepoint-
    * level twin of [[graft.functions.TextAnalysis.normalize]]'s
    * whitespace/case pass: decomposed sequences (e + U+0301) fold to
    * their precomposed forms so that visually-identical strings hash,
    * dedup, and tokenize identically — a crawl mixing editors/OSes
    * carries both encodings of the same text, and every hash-keyed
    * operator upstream silently treats them as different documents.
    * A UDF by necessity (no Catalyst expression exposes ICU/java.text
    * normalization — the same justified-UDF class as the Bloom probes);
    * still a narrow per-row map, zero shuffle. */
  private val nfcUdf = org.apache.spark.sql.functions.udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  def normalizeNfc(text: Column): Column = nfcUdf(text)

  /** Per-document NFC normalization report: whether normalization
    * changed the text, codepoint counts before/after, and the hash of
    * the normalized form (the dedup key a mixed-encoding crawl needs). */
  def nfcReport(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val norm = normalizeNfc(col(textCol))
    df.select(col(idCol),
      (norm =!= col(textCol)).cast("int").as("changed"),
      length(col(textCol)).cast("int").as("n_chars_before"),
      length(norm).cast("int").as("n_chars_after"),
      md5(norm).as("normalized_md5"))
  }

  /** AWS-style access key ids: `AKIA` + 16 uppercase alphanumerics. */
  val AwsKeyPattern = "^AKIA[0-9A-Z]{16}$"

  /** JWT-shaped tokens: the `eyJ` base64url header prefix + 17+ token
    * chars (every real JWT starts with base64url of `{"` = `eyJ`). */
  val JwtPattern = "^eyJ[A-Za-z0-9._-]{17,}$"

  /** 40-hex-char blobs (SHA-1s, many API token formats). */
  val Hex40Pattern = "^[0-9a-f]{40}$"

  /** Charset of generic machine-generated tokens (base64/base64url/hex). */
  val SecretCharsetPattern = "^[A-Za-z0-9+/=_-]+$"

  /** Shannon char entropy of one token, in micronats, quantize-then-sum
    * (the charEntropy/perplexity exactness discipline): H = qln(len) −
    * Σ n_c·qln(n_c) div len over the per-character counts; empty token
    * → NULL. Since round 11 this is the NATIVE codegen'd expression
    * [[graft.plans.TokenEntropy]] — the previous HOF chain was
    * interpreted and O(distinct²) per token, which the honest bench
    * action priced at 2.8 s for secret_scan at sf0.1; the native O(n)
    * pass is bit-exact to it (same Math.log, same quantization, same
    * truncating division — element-for-element parity pinned in
    * ClassifierSpec). */
  def tokenEntropyMicronats(tok: Column): Column =
    graft.plans.TokenEntropy(tok)

  /** Secret/credential scanning census + scrub — the pretraining-corpus
    * hygiene step PII redaction does not cover (leaked API keys and
    * tokens in crawled code/docs are a memorization liability, distinct
    * from emails/phones). Three explicit pattern classes (AWS key id,
    * JWT, 40-hex) plus the generic detector real scanners rely on:
    * long (≥ `minLen`) single-charset tokens whose character entropy
    * clears `minEntropyMicronats` (machine-generated randomness scores
    * near ln(alphabet); natural words are short and repetitive).
    * Classes overlap by design — the census counts each independently;
    * `n_secret_tokens` and the scrub use the union. Everything is one
    * narrow codegen'd select over the token array (HOF filters + the
    * per-token entropy expression): zero shuffle, embarrassingly
    * parallel at 100 TB. */
  def secretScan(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minLen: Int = 20,
      minEntropyMicronats: Long = 2300000L): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    def highEntropy(t: Column): Column =
      (length(t) >= minLen) && t.rlike(SecretCharsetPattern) &&
        (tokenEntropyMicronats(t) >= minEntropyMicronats)
    def isSecret(t: Column): Column =
      t.rlike(AwsKeyPattern) || t.rlike(JwtPattern) ||
        t.rlike(Hex40Pattern) || highEntropy(t)
    df.select(col(idCol),
      size(filter(toks, isSecret(_))).cast("int").as("n_secret_tokens"),
      size(filter(toks, t => t.rlike(AwsKeyPattern))).cast("int")
        .as("n_aws_keys"),
      size(filter(toks, t => t.rlike(JwtPattern))).cast("int").as("n_jwt"),
      size(filter(toks, t => t.rlike(Hex40Pattern))).cast("int")
        .as("n_hex40"),
      size(filter(toks, highEntropy(_))).cast("int").as("n_high_entropy"),
      array_max(transform(toks, tokenEntropyMicronats(_)))
        .as("max_token_entropy_micronats"),
      md5(array_join(transform(toks,
          t => when(isSecret(t), lit("[SECRET]")).otherwise(t)), " "))
        .as("scrubbed_md5"))
  }
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning and PII redaction for training-data curation — the
  * scrub pass every web-scale corpus goes through before tokenization:
  * mask emails/URLs/long digit runs, collapse whitespace, and count
  * what was masked (the counts feed the quality gate: a doc that is
  * mostly PII or URLs is boilerplate, not prose).
  *
  * All pure `Column` expressions over codegen'd `regexp_replace` /
  * `regexp_count` — no UDFs, no shuffle, no state: the scrub runs
  * inside WholeStageCodegen on the scan, composes with pushdown, and
  * scales embarrassingly (per-row work only).
  *
  * The patterns deliberately use the regex subset that Java's engine
  * and RE2-family engines (DuckDB, Go) interpret identically — plain
  * char classes, `{m,}` bounds, `\\.` escapes — so downstream systems
  * can replay the exact same scrub.
  *
  * Reference scope: the reference pipeline has no scrub stage; this
  * extends its T5 per-record error-tolerance contract
  * (`/root/reference/script.py:60-66` — normalize, never fail the
  * batch) to content hygiene.
  */
object Cleaning {

  /** Email addresses (conservative RFC-ish shape). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** http/https URLs up to the next whitespace. */
  val UrlRe = "https?://[^ \\t\\r\\n]+"

  /** Digit runs long enough to be phone numbers / account ids. */
  val LongDigitsRe = "[0-9]{7,}"

  /** Ordered (pattern, replacement-tag) scrub table. Order matters:
    * URLs are masked before digit runs so a numeric path segment
    * doesn't get double-masked.
    */
  val scrubs: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    UrlRe -> "<URL>",
    LongDigitsRe -> "<NUM>")

  /** Mask every PII-shaped span with its tag. */
  def redact(text: Column): Column =
    scrubs.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Per-category match counts (email, url, long-digit-run), computed
    * on the SAME masking order as [[redact]] so categories never
    * double-count one span.
    */
  def redactionCounts(text: Column): Seq[(String, Column)] = {
    val staged = scrubs.inits.toSeq.reverse // [], [email], [email,url], ...
    scrubs.zip(staged.init).map { case ((re, tag), before) =>
      val masked = before.foldLeft(text) { case (c, (r, t)) =>
        regexp_replace(c, r, t)
      }
      val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
      name -> regexp_count(masked, lit(re))
    }
  }

  /** Whitespace normalization: collapse runs to one space, trim. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, "[ \\t\\r\\n]+", " "))

  /** The full scrub: redact PII, then normalize whitespace. */
  def clean(text: Column): Column = normalizeWs(redact(text))

  // ---- HTML boilerplate removal (the extraction pass that precedes
  // every web-corpus curation ladder — the trafilatura/CCNet step,
  // reduced to its deterministic core) ----

  /** Content-bearing block removals FIRST: script/style lose their
    * CONTENT, not just their tags. Two patterns, not one with a
    * backreference — RE2 engines (DuckDB) have no backreferences, and
    * the Java∩RE2 dialect is this module's contract. `(?is)`: tags are
    * case-insensitive, scripts span lines.
    */
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"

  /** HTML comments (dotall: comments span lines). */
  val CommentRe = "(?s)<!--.*?-->"

  /** Any remaining tag. The leading letter (or `/`) requirement keeps
    * free-standing `<` in prose (`1 < 2`) out of the match — only
    * markup-shaped spans strip.
    */
  val TagRe = "(?i)</?[a-z][^>]*>"

  /** Single-pass entity table. `&amp;` decodes LAST, so an escaped
    * entity (`&amp;lt;`) yields the literal text `&lt;` rather than
    * double-decoding — the standard one-pass unescape contract.
    */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#34;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** HTML → text: drop script/style blocks and comments, replace every
    * tag with a space (block boundaries must break words), decode the
    * entity table, collapse whitespace. Pure codegen'd per-row
    * expressions, same scale shape as [[clean]].
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = Seq(ScriptRe, StyleRe, CommentRe, TagRe)
      .foldLeft(html)((c, re) => regexp_replace(c, re, " "))
    normalizeWs(entities.foldLeft(noBlocks) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    })
  }
}

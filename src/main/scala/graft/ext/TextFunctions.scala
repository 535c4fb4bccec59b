package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis function pack for large-scale training-data pipelines:
  * tokenization, token shingles, quality scoring, language-ID heuristics,
  * and content fingerprinting — all pure Column expressions (codegen'd,
  * no UDFs), so they run inside WholeStageCodegen over billions of docs.
  */
object TextFunctions {

  /** Whitespace tokenization of lower-cased text. Guard: `split("")`
    * yields `[""]`, not `[]` — an empty/blank doc must have ZERO tokens,
    * not one phantom empty token.
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Consecutive token n-grams ("shingles") — the unit of near-dup
    * comparison. Distinct-ified by callers.
    *
    * Built as a `zip_with` CHAIN over shifted slices of the token
    * array, NOT as `transform(sequence(...), i => element_at(t, i+o))`:
    * a higher-order lambda does not share its captured subtree, so the
    * element_at form re-evaluated the whole `split(lower(trim(text)))`
    * for EVERY element of every shingle — O(n·|shingles|) full regex
    * splits per document, the silently dominant CPU cost of every
    * shingle consumer (near-dup pairs, MinHash signing, decontam) at
    * any scale. The chain form evaluates the split O(n) times PER ROW.
    * Step o zips the (o+1)-gram prefix with the o-shifted token slice;
    * `concat_ws` skips the null padding zip_with adds past the shorter
    * slice, and the final `slice(…, 1, cnt)` drops those partial
    * trailing grams — output identical to the old form, including the
    * explicit zero-shingle guard for docs shorter than n tokens.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val cnt = size(t) - (n - 1)
    val grams = (1 until n).foldLeft(t) { (acc, o) =>
      zip_with(acc, slice(t, lit(o + 1), size(t) - o),
        (a, b) => concat_ws(" ", a, b))
    }
    when(cnt >= 1, slice(grams, lit(1), cnt))
      .otherwise(array().cast("array<string>"))
  }

  /** Normalized content fingerprint: md5 of lower-cased,
    * whitespace-collapsed text. Two docs with the same fingerprint are
    * exact duplicates modulo case/spacing.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Stopword-list hit count (the building block of both the language-ID
    * heuristic and the quality score).
    */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately minimal — the operator shape (score each
    * language, argmax with a deterministic tie order) is what scales, the
    * lists are swappable.
    */
  val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Language-ID: argmax of per-language stopword hits, ties broken by
    * list order (first language wins), zero hits → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    // array_max on (hits, prio, lang) structs picks highest hits; ties
    // resolve by prio, which encodes list position so the FIRST language
    // in the list wins equal scores.
    val ranked = stopwordsByLang.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        stopwordHits(text, words).as("hits"),
        lit(stopwordsByLang.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(ranked: _*))
    when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0, 1]: blends length saturation, alpha ratio and
    * mean word length sanity — the standard cheap pre-filter shape for
    * training-data curation.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(trim(text)).cast("double")
    val nTok = tokenCount(text).cast("double")
    val lengthSat = least(nChars / lit(500.0), lit(1.0))
    val alphaRatio =
      length(regexp_replace(lower(trim(text)), "[^a-z]", "")).cast("double") /
        greatest(nChars, lit(1.0))
    val meanWord = nChars / greatest(nTok, lit(1.0))
    val wordSanity = when(meanWord.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    round(lit(0.4) * lengthSat + lit(0.4) * alphaRatio + lit(0.2) * wordSanity, 6)
  }
}

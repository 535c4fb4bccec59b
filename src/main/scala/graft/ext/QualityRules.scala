package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named per-document QUALITY RULES — the Gopher-style filter ladder
  * (Rae et al. 2021, §A1.1: word-count bounds, mean-word-length sanity,
  * symbol-to-word ratio, alphabetic-word ratio, stopword presence) as a
  * declarative rule set: every rule is a named boolean Column, the
  * verdict is the conjunction, and each dropped doc names its FIRST
  * failing rule — the attribution curation pipelines need to tune
  * thresholds (what fraction died to which rule), which a single
  * blended score ([[TextFunctions.qualityScore]]) cannot give.
  *
  * Scale shape: pure codegen'd row expressions — no shuffle, no join,
  * no UDF; the whole rule set evaluates inside WholeStageCodegen on
  * the scan, and composes with pushdown (`WHERE keep` prunes at the
  * source). Per-rule kill counts are one aggregate over the flags.
  */
object QualityRules {

  /** One named pass/fail predicate over a document. */
  final case class Rule(name: String, pass: Column)

  /** The Gopher rule set over whitespace tokens (thresholds are the
    * paper's, scaled where noted). Rules evaluate in list order for
    * first-failure attribution.
    */
  def gopher(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is"),
      minStopwordHits: Int = 2): Seq[Rule] = {
    val toks = TextFunctions.tokens(text)
    val nTok = size(toks).cast("double")
    // token characters only (whitespace removed), for mean word length
    val nChars = length(regexp_replace(text, "\\s", "")).cast("double")
    val meanLen = nChars / greatest(nTok, lit(1.0))
    val alphaToks = size(filter(toks, t => t.rlike("[a-z]"))).cast("double")
    // Gopher's symbol family: '#' and ellipsis
    val symbols =
      ((length(text) - length(regexp_replace(text, "#", ""))) +
        (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
        .cast("double")
    Seq(
      Rule("word_count",
        size(toks) >= minWords && size(toks) <= maxWords),
      Rule("mean_word_length", meanLen >= 3.0 && meanLen <= 10.0),
      Rule("symbol_to_word_ratio",
        symbols / greatest(nTok, lit(1.0)) <= 0.1),
      Rule("alpha_word_ratio", alphaToks / greatest(nTok, lit(1.0)) >= 0.8),
      Rule("stopword_hits",
        TextFunctions.stopwordHits(text, stopwords) >= minStopwordHits))
  }

  /** Evaluate a rule set: per-rule boolean columns (rule names), `keep`
    * (all pass), and `first_fail` (name of the first failing rule in
    * list order; null when kept).
    */
  def evaluate(df: DataFrame, textCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    val flagged = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(r.name, r.pass)
    }
    val firstFail = rules.reverse.foldLeft(lit(null).cast("string")) {
      (acc, r) => when(!col(r.name), lit(r.name)).otherwise(acc)
    }
    flagged
      .withColumn("keep", rules.map(r => col(r.name)).reduce(_ && _))
      .withColumn("first_fail", firstFail)
  }

  /** Per-rule kill attribution: how many docs each rule killed FIRST,
    * plus the kept count — the tuning report. One aggregate.
    */
  def killReport(evaluated: DataFrame): DataFrame =
    evaluated.groupBy(coalesce(col("first_fail"), lit("(kept)")).as("rule"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
}

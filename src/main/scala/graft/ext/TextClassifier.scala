package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token counts — the quality/domain
  * classifier rung of the curation ladder that stays ORACLE-EXACT:
  * training is closed-form counting (priors, add-one-smoothed token
  * likelihoods), so unlike iterative classifiers the whole fit+predict
  * is replayable as relational algebra in any engine.
  *
  * Scale shape: fit is two count shuffles (per-class doc counts; per
  * (term, class) token counts) + one broadcast scalar row (vocab size);
  * the likelihood grid is |vocab| × |classes| — vocabulary-bounded, not
  * corpus-bounded. Scoring joins the corpus' postings against the grid
  * on term (the grid broadcast when small), aggregates per (doc,
  * class), and takes the per-doc argmax with a doc-partitioned window.
  * Log-scores round to 6 dp BEFORE the argmax so the winner is
  * engine-deterministic; ties break on label order.
  */
object TextClassifier {

  /** Fit on (`textCol`, `labelCol`) and classify every document;
    * returns (id, label, predicted, score) — `score` the winning
    * rounded log-posterior. Standard multinomial NB with add-one
    * smoothing: P(c|d) ∝ ln P(c) + Σ_t tf(t,d) · ln P(t|c),
    * P(t|c) = (n(t,c) + 1) / (n(c) + V).
    */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), col(labelCol).as("label"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // doc counts per class -> ln prior (one tiny aggregate)
    val nDocs = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val priors = nDocs.crossJoin(
        broadcast(docs.agg(count(lit(1)).as("n_total"))))
      .select(col("label"), log(col("n_docs") / col("n_total")).as("ln_prior"))
    // per-(term, class) counts and per-class token totals.
    // r15: materialized once — the (|vocab| × |classes|)-bounded fit
    // artifact feeds THREE consumers (class totals, the vocab distinct,
    // the grid join), each of which lazily re-ran the corpus
    // explode+count beneath it. One tokenize+count fit pass + one
    // scoring pass is the closed-form NB cost; see LangModel.unigramFit.
    val termClass = toks.groupBy("term", "label")
      .agg(count(lit(1)).as("n_tc"))
      .localCheckpoint()
    val classTokens = termClass.groupBy("label")
      .agg(sum(col("n_tc")).as("n_c"))
    val vocab = termClass.select("term").distinct()
    val vSize = vocab.agg(count(lit(1)).cast("double").as("v"))
    // the full |vocab| x |classes| likelihood grid, zeros smoothed in
    val grid = vocab.crossJoin(classTokens)
      .join(termClass, Seq("term", "label"), "left")
      .crossJoin(broadcast(vSize))
      .select(col("term"), col("label").as("_c"),
        log((coalesce(col("n_tc"), lit(0L)) + 1.0) / (col("n_c") + col("v")))
          .as("ln_p"))
    // score every doc against every class it has evidence rows for:
    // a doc's terms all exist in the vocab (they trained it), so each
    // (doc, class) pair accumulates the full Σ tf·ln P(t|c). The grid
    // is vocabulary-bounded (|vocab| × |classes|), so pin the broadcast
    // rather than trusting the auto-broadcast size estimate of a
    // multi-join subtree — the postings side must never shuffle for it
    val scored = toks.join(broadcast(grid), "term")
      .groupBy(col("id"), col("label"), col("_c"))
      .agg(sum(col("ln_p")).as("ln_like"))
      .join(broadcast(priors.select(col("label").as("_c"),
        col("ln_prior"))), "_c")
      .select(col("id"), col("label"), col("_c"),
        round(col("ln_prior") + col("ln_like"), 6).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("_c").asc)
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("id"), col("label"), col("_c").as("predicted"),
        col("score"))
  }
}

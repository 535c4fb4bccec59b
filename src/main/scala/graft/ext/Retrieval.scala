package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over a document corpus — the classic
  * BM25 scorer (Robertson/Spärck Jones probabilistic weighting, the
  * default ranking of Lucene/Elasticsearch and DuckDB's FTS extension),
  * expressed as a declarative Spark plan.
  *
  * Scale shape (the 100 TB story): the corpus is NEVER shuffled whole.
  * The only exploded rows that survive past the scan are postings of
  * the QUERY terms (the `isin` filter sits directly on the generate
  * output, before any exchange), so the tf shuffle carries
  * |terms| × |matching docs| rows; document-frequency is a |terms|-row
  * aggregate broadcast back onto them; the corpus-level constants
  * (N, avgdl) fold to one broadcast scalar row. Top-k is
  * TakeOrdered — per-partition heaps, no global sort, no
  * single-partition window.
  */
object Retrieval {

  /** BM25 top-k: the `k` best documents for a bag of query `terms`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the
    * Lucene-standard non-negative idf form.
    *
    * Emits (id, n_terms_hit, score) for the top `k` by
    * (round(score, 6) DESC, id): rounding BEFORE the cut makes the
    * boundary deterministic across engines (the q-pack convention).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty query")
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("id"), col("tk"), size(col("tk")).cast("double").as("dl"))
    // corpus constants: one reduce, one broadcast row
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // per-(doc, term) term frequency — only query-term postings shuffle
    val tf = toks
      .select(col("id"), col("dl"), explode(col("tk")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    // document frequency per term: |terms| rows, broadcast back
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_terms_hit"),
        round(sum(idf * norm), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Positional PROXIMITY match — the phrase/near-query rung above
    * [[bm25TopK]]'s bag-of-words scoring: documents where `termA` and
    * `termB` co-occur within `window` tokens, with the closest pair
    * distance as the relevance signal (Lucene's sloppy phrase query,
    * relationally). Only the two terms' positional postings survive the
    * scan-side filter; the pair join is per-document (keyed on the doc
    * id) and bounded by per-doc term frequencies — never corpus-sized.
    * Output: (idCol, n_a, n_b, min_dist) for docs where both occur and
    * min |posA − posB| ≤ window.
    */
  def proximity(docs: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, window: Int): DataFrame = {
    require(termA != termB, "proximity needs two distinct terms")
    val pos = docs.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("_p", "_t")))
      .where(col("_t").isin(termA, termB))
    val pa = pos.where(col("_t") === termA).select(col(idCol), col("_p").as("_pa"))
    val pb = pos.where(col("_t") === termB).select(col(idCol), col("_p").as("_pb"))
    pa.join(pb, Seq(idCol))
      .groupBy(col(idCol))
      .agg(count_distinct(col("_pa")).as("n_a"),
        count_distinct(col("_pb")).as("n_b"),
        min(abs(col("_pa") - col("_pb"))).cast("long").as("min_dist"))
      .where(col("min_dist") <= window)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    // per-(doc, term) term frequency — only query-term postings shuffle.
    // r15: materialized once (|terms| × |matching docs| rows — bounded
    // by the query, never corpus-sized): it feeds BOTH the df aggregate
    // and the scoring join, and left lazy each consumer re-ran the full
    // corpus tokenize+explode — three corpus passes per query instead
    // of the two (constants + postings) the algorithm needs.
    val tf = toks
      .select(col("id"), col("dl"), explode(col("tk")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint()
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

  /** Reciprocal-rank fusion — the standard rank combiner for HYBRID
    * retrieval (lexical BM25 ∪ dense cosine): each retriever ranks its
    * own candidate list per query, and a document's fused score is
    * Σ_lists 1/(kRrf + rank). Fusing in RANK space needs no score
    * calibration between BM25's unbounded scores and cosine's [-1, 1]
    * — only the orders matter (kRrf=60 is the published default).
    *
    * Scale shape: the inputs are already per-(query, retriever) TOP-K
    * candidate lists, so everything here acts on
    * |queries| × |retrievers| × k rows — never corpus-sized; the heavy
    * lifting stays inside each retriever. The rank windows partition by
    * (query, retriever) and the final cut by query, so no global
    * window appears at any scale.
    *
    * Determinism: per-list rank orders by (round(score, 6) DESC, id);
    * the fused score rounds to 9 dp (each row sums ≤ |retrievers|
    * reciprocals, so accumulation-order error is far below 1e-9) and
    * ties break on id — both cuts replay exactly in an independent
    * engine.
    *
    * @param candidates rows of (qidCol, srcCol, idCol, scoreCol): one
    *   row per retained candidate per retriever list
    * @return (qid, id, n_lists, rrf, rank) — top `k` per qid by
    *   (rrf DESC, id), rank 1..k
    */
  def rrfFuse(candidates: DataFrame, qidCol: String, srcCol: String,
      idCol: String, scoreCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(k > 0 && kRrf > 0, s"rrfFuse: k=$k, kRrf=$kRrf must be > 0")
    val perList = Window.partitionBy(col(qidCol), col(srcCol))
      .orderBy(round(col(scoreCol), 6).desc, col(idCol))
    val fused = candidates
      .withColumn("_r", row_number().over(perList))
      .groupBy(col(qidCol).as("qid"), col(idCol).as("id"))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("_r"))), 9).as("rrf"))
    val perQuery = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(perQuery).cast("long"))
      .where(col("rank") <= k)
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

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{NearDup, Packing, Sampling, Similarity, TextFunctions, Vocab}

/** Training-data-pipeline operator surface over the `documents` and
  * `embeddings` tables: exact + near deduplication, similarity search,
  * text analysis, fingerprinting.
  *
  * The raw documents table has no duplicate texts, so the dedup queries
  * UNION deterministic mutated copies (shifted ids) to create known
  * duplicates/near-duplicates — both engines build the identical corpus.
  *
  * Scale discipline: no query contains a crossJoin of the corpus. The
  * near-dup path is an inverted-index join bucketed by shingle; the ANN
  * baseline broadcasts only the (small) query-vector set; MinHash/SimHash
  * (no SQL oracle — signature hashes aren't replicable in DuckDB) get
  * rows-only checks here and recall assertions in ScalaTest.
  */
object LlmQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The documents/embeddings tables are single parquet files, so a bare
    * scan is ONE task — and Spark evaluates partial aggregates and
    * per-row expression work (64-way minhash, regex token splits, dot
    * products) inside that task, pinning CPU-bound operators to one
    * core. Fan out to the session's parallelism first; at warehouse
    * scale the input arrives in many splits and this is a no-op choice.
    */
  private def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** documents ∪ exact copies (every 10th doc, id + 1e6). */
  private def withExactDups(docs: DataFrame): DataFrame =
    docs.unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))

  private val dupUnionSql = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text, lang, source, n_chars
    FROM documents WHERE doc_id % 10 = 0"""

  /** documents ∪ near-dup mutants (every 20th doc, two tokens appended). */
  private def withNearDups(docs: DataFrame): DataFrame =
    docs.unionByName(
      docs.where(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(col("text"), lit(" zq zq"))))

  private val nearDupUnionSql = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' zq zq'
    FROM documents WHERE doc_id % 20 = 0"""

  /** documents ∪ mutants ∪ mutants² — every 40th doc gets a second-level
    * mutant whose Jaccard to the ORIGINAL falls below the threshold for
    * short docs while staying above it to the first mutant: components
    * become paths, so clustering must propagate transitively.
    */
  private def withNearDupChains(docs: DataFrame): DataFrame =
    withNearDups(docs).unionByName(
      docs.where(col("doc_id") % 40 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L)
        .withColumn("text", concat(col("text"), lit(" zq zq zq zq"))))

  private val nearDupChainSql = nearDupUnionSql + """
    UNION ALL
    SELECT doc_id + 2000000, text || ' zq zq zq zq'
    FROM documents WHERE doc_id % 40 = 0"""

  val all: Seq[Q] = Seq(

    // ---- q30: exact dedup, deterministic keep-first (one shuffle on the
    // content fingerprint; the D1 form generalized to content keys). ----
    Q("q30_docs_exact_dedup",
      (s, dir) => {
        val docs = withExactDups(fan(t(s, dir, "documents")))
        NearDup.exact(docs, "text", Seq(col("doc_id")))
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH u AS ($dupUnionSql)
        SELECT doc_id, lang, source, n_chars FROM u
        QUALIFY row_number() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id) = 1
        ORDER BY doc_id""")),

    // ---- q31: EXACT shingle-Jaccard near-dup via the inverted-index
    // join (bucket = shingle; no crossJoin — cost scales with posting
    // lists, not |docs|²). Oracle replays the same token-3-gram Jaccard
    // in DuckDB from unnested postings. ----
    Q("q31_docs_jaccard_neardup",
      (s, dir) => {
        val docs = withNearDups(fan(t(s, dir, "documents")))
        NearDup.jaccardPairs(docs, "doc_id", "text",
            n = 3, minJaccard = 0.6)
          .select(col("id1"), col("id2"),
            col("n_common").cast("long").as("n_common"),
            col("sz1").cast("long").as("sz1"),
            col("sz2").cast("long").as("sz2"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      Some(s"""
        WITH u AS ($nearDupUnionSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id1, id2, n_common, s1.sz AS sz1, s2.sz AS sz2,
               round(CAST(n_common AS DOUBLE) /
                     CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE CAST(n_common AS DOUBLE) /
              CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 0.6
        ORDER BY id1, id2""")),

    // ---- q48: the 100 TB MODE of the exact-Jaccard inverted index —
    // the maxShingleFreq stopword-shingle cut (drop shingles appearing
    // in more than F docs BEFORE the posting self-join). Ultra-frequent
    // boilerplate shingles are what makes the exact join quadratic at
    // scale; the cut bounds every posting list at F. F=4 drops the
    // frequent tail of this corpus (doc-freq histogram tops out at 9),
    // and the oracle replays the IDENTICAL filter, so the scale mode is
    // hash-gated rather than merely documented. ----
    Q("q48_docs_jaccard_freqcut",
      (s, dir) => {
        val docs = withNearDups(fan(t(s, dir, "documents")))
        // the prefix-filtered (AllPairs) form: the freq-cut mode is
        // exactly the skewed-frequency regime it is built for
        NearDup.jaccardPairsPrefix(docs, "doc_id", "text",
            n = 3, minJaccard = 0.6, maxShingleFreq = 4)
          .select(col("id1"), col("id2"),
            col("n_common").cast("long").as("n_common"),
            col("sz1").cast("long").as("sz1"),
            col("sz2").cast("long").as("sz2"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      Some(s"""
        WITH u AS ($nearDupUnionSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post0 AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        keep AS (SELECT sh FROM post0 GROUP BY sh HAVING count(*) <= 4),
        post AS (SELECT p.doc_id, p.sh FROM post0 p JOIN keep k USING (sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id1, id2, n_common, s1.sz AS sz1, s2.sz AS sz2,
               round(CAST(n_common AS DOUBLE) /
                     CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE CAST(n_common AS DOUBLE) /
              CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 0.6
        ORDER BY id1, id2""")),

    // ---- q49: repetition quality signals (the Gopher/RefinedWeb-style
    // within-document repetition filter): per-doc 2-gram count, repeated
    // 2-gram fraction (1 − distinct/total), and the keep/drop verdict at
    // the 0.2 threshold — pure expressions over TextFunctions.shingles,
    // the cheap pre-filter shape that runs inline in a scan at 100 TB. ----
    Q("q49_docs_repetition",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val sh2 = TextFunctions.shingles(col("text"), 2)
        // fence after the counts: rep_frac and keep both reference n2/nd,
        // and CollapseProject would otherwise re-inline the shingle
        // transform into every use (~6 evaluations per row)
        val counts = docs.select(col("doc_id"),
            size(sh2).cast("long").as("n_2grams"),
            size(array_distinct(sh2)).cast("long").as("nd"))
          .localCheckpoint()
        val rep = when(col("n_2grams") > 0,
          lit(1.0) - col("nd").cast("double") / col("n_2grams").cast("double"))
          .otherwise(lit(0.0))
        counts.select(col("doc_id"), col("n_2grams"),
            round(rep, 6).as("rep_frac"),
            (rep < 0.2).as("keep"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        g AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 2
                      THEN list_transform(range(1, len(tk)),
                                          i -> tk[i] || ' ' || tk[i+1])
                      ELSE CAST([] AS VARCHAR[]) END AS sh
          FROM d),
        m AS (
          SELECT doc_id, len(sh) AS n2,
                 CASE WHEN len(sh) > 0
                      THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
                                 / CAST(len(sh) AS DOUBLE)
                      ELSE 0.0 END AS rep
          FROM g)
        SELECT doc_id, CAST(n2 AS BIGINT) AS n_2grams,
               round(rep, 6) AS rep_frac, rep < 0.2 AS keep
        FROM m ORDER BY doc_id""")),

    // ---- q54: dedup CLUSTERING — connected components over the
    // near-dup pair list (NearDup.clusters: distributed min-label
    // propagation with pointer jumping). The corpus plants CHAINS:
    // orig → mutant (+' zq zq', every 20th) → mutant² (+' zq zq zq zq',
    // every 40th). Short docs lack a direct orig↔mutant² edge, so the
    // component is a path and cluster assignment genuinely requires
    // transitive propagation — this is the step that turns pairwise
    // similarity into "keep one doc per duplicate group"
    // (is_canonical = doc_id == cluster_id). The DuckDB oracle computes
    // the same components by recursive transitive closure over the
    // identically-derived edge set. ----
    Q("q54_docs_dedup_clusters",
      (s, dir) => {
        val docs = withNearDupChains(fan(t(s, dir, "documents")))
        val pairs = NearDup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.6)
        val w = Window.partitionBy(col("cluster_id"))
        NearDup.clusters(docs.select("doc_id"), "doc_id", pairs)
          .withColumn("cluster_size", count(lit(1)).over(w))
          .select(col("doc_id"), col("cluster_id"),
            col("cluster_size").cast("long").as("cluster_size"),
            (col("doc_id") === col("cluster_id")).as("is_canonical"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE
        u AS ($nearDupChainSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id1, id2
          FROM inter
          JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2
          WHERE CAST(n_common AS DOUBLE) /
                CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 0.6),
        edges AS (
          SELECT id1 AS s, id2 AS d FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM u
          UNION
          SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id
          FROM reach GROUP BY src)
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size,
               doc_id = cluster_id AS is_canonical
        FROM comp ORDER BY doc_id""")),

    // ---- q55: deterministic STRATIFIED SAMPLING — training-data
    // mixture shaping. Membership is a pure function of the row
    // (md5(id:salt) hex prefix < per-language threshold, broadcast rate
    // dim), NOT an RNG draw: the kept set is identical across runs,
    // partitionings, task retries, and engines — which is exactly why
    // DuckDB can replay it to the row. Languages without a declared
    // rate (es, fr) exercise the keep-all default. ----
    Q("q55_docs_stratified_sample",
      (s, dir) => {
        Sampling.sampleBy(t(s, dir, "documents"), "doc_id", "lang",
            Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.75), salt = "mix")
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some("""
        WITH cuts(lang, cut) AS (
          VALUES ('en', '80000000'), ('zh', '40000000'), ('de', 'c0000000'))
        SELECT d.doc_id, d.lang, d.source
        FROM documents d LEFT JOIN cuts c ON d.lang = c.lang
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8)
              < coalesce(c.cut, 'g')
        ORDER BY d.doc_id""")),

    // ---- q57: int8 embedding quantization — the similarity stack's
    // storage rung (4× compression + per-vector scale). Quantized
    // components are emitted as an exact comma-joined string, so every
    // int8 value is inside the hash compare; arithmetic is pinned to
    // DOUBLE + floor on both engines (round/int-cast semantics differ
    // across engines; floor does not). ExtSpec separately checks
    // dequantized top-k recall against the full-precision ranking. ----
    Q("q57_embed_quantize_int8",
      (s, dir) => {
        val (scale, q) = Similarity.quantizeInt8(col("embedding"))
        fan(t(s, dir, "embeddings"))
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("n_dims"),
            scale.as("scale"),
            array_join(transform(q, _.cast("string")), ",").as("qstr"))
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding, v -> abs(v))) AS s
          FROM embeddings)
        SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
               CAST(s AS DOUBLE) AS scale,
               CASE WHEN s IS NULL OR s = 0
                    THEN array_to_string(list_transform(embedding, v -> 0), ',')
                    ELSE array_to_string(list_transform(embedding, v ->
                         CAST(floor(CAST(v AS DOUBLE) / CAST(s AS DOUBLE)
                              * 127) AS INT)), ',')
               END AS qstr
        FROM e ORDER BY vec_id""")),

    // ---- q58: sequence packing — concat-then-chunk assignment of every
    // doc to its pretraining sequence (per-language stream, 512-token
    // budget, BPE-ish token counts shared with q42). Pure integer window
    // arithmetic: one shuffle on the stream key, streaming running-sum
    // frame, no buffering. ----
    Q("q58_docs_sequence_packing",
      (s, dir) => {
        val bpeish = " ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+"
        Packing.packAssignments(
            t(s, dir, "documents"), "doc_id", "lang",
            regexp_count(lower(col("text")), lit(bpeish)), budget = 512)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(len(regexp_extract_all(lower(text),
                      ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS BIGINT)
                   AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
        SELECT doc_id, lang, n_tokens,
               CAST(cum - n_tokens AS BIGINT) AS start_offset,
               CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
               CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_seq,
               greatest(0, CAST(floor((cum - 1) / 512.0) AS BIGINT)
                           - CAST(floor((cum - n_tokens) / 512.0) AS BIGINT))
                 AS extra_seqs
        FROM c ORDER BY doc_id""")),

    // ---- q32: MinHash LSH near-dup (the sub-linear 100 TB path):
    // banded xxhash64 signature join → candidates → exact verification.
    // Run at minJaccard = 1.0 over planted EXACT duplicates, recall is
    // STRUCTURAL, which is what makes this oracle-able: jaccard 1 means
    // identical distinct-shingle sets, identical shingle sets mean
    // identical minhash signatures, so the pair collides in every band
    // — no probabilistic miss — and the exact-verify step discards any
    // sub-1.0 band collision. The DuckDB oracle brute-forces the same
    // criterion (equal shingle sets) with no xxhash64 involved; LSH
    // recall at sub-1.0 thresholds stays covered by ExtSpec against the
    // exact q31 answer. ----
    Q("q32_docs_minhash_lsh",
      (s, dir) => {
        val docs = withExactDups(fan(t(s, dir, "documents")))
        NearDup.minhashLshPairs(docs, "doc_id", "text",
            n = 3, numHashes = 64, numBands = 16, minJaccard = 1.0)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      Some(s"""
        WITH u AS ($dupUnionSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id1, id2,
               round(CAST(n_common AS DOUBLE) /
                     CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE CAST(n_common AS DOUBLE) /
              CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 1.0
        ORDER BY id1, id2""")),

    // ---- q33: brute-force top-k cosine — the exact ANN baseline.
    // Query set (every 50th vector) broadcasts; corpus streams through
    // one codegen'd projection; per-query top-5 via window rank on the
    // ROUNDED cosine (+id tiebreak) so ranking is engine-stable. ----
    Q("q33_embed_topk_cosine",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "qid", "qvec", k = 5)
          .select(col("qid"), col("rank").cast("long").as("rank"),
            col("id"), col("cosine"))
          .orderBy("qid", "rank")
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
          FROM embeddings WHERE vec_id % 50 = 0),
        scored AS (
          SELECT q.qid, e.vec_id AS id,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, rank, id, cosine FROM ranked
        WHERE rank <= 5 ORDER BY qid, rank""")),

    // ---- q34: text-analysis rollup per language: token counts, char
    // stats, exact interpolated median, stopword ratio. ----
    Q("q34_docs_text_stats",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val toks = TextFunctions.tokenCount(col("text"))
        val stop = TextFunctions.stopwordHits(col("text"),
          Seq("the", "a", "of", "and", "to"))
        docs.select(col("lang"), col("n_chars"), toks.as("n_tokens"),
            stop.as("n_stop"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("total_tokens"),
            round(avg(col("n_tokens")), 2).as("avg_tokens"),
            round(expr("percentile(n_chars, 0.5)"), 2).as("median_chars"),
            max(col("n_chars")).cast("long").as("max_chars"),
            round(sum(col("n_stop")).cast("double") /
              sum(col("n_tokens")).cast("double"), 6).as("stopword_ratio"))
          .orderBy("lang")
      },
      Some("""
        WITH toks AS (
          SELECT lang, n_chars,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        d AS (
          SELECT lang, n_chars, len(tk) AS n_tokens,
                 len(list_filter(tk,
                     t -> t IN ('the','a','of','and','to'))) AS n_stop
          FROM toks)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_tokens), 2) AS avg_tokens,
               round(quantile_cont(n_chars, 0.5), 2) AS median_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               round(CAST(sum(n_stop) AS DOUBLE) /
                     CAST(sum(n_tokens) AS DOUBLE), 6) AS stopword_ratio
        FROM d GROUP BY lang ORDER BY lang""")),

    // ---- q35: language-ID heuristic + quality score per doc, through
    // the LIBRARY functions (TextFunctions.langId / qualityScore) so the
    // declared query and the reusable operator cannot drift. The oracle
    // replays langId's argmax-with-priority-ties as a CASE chain over
    // the same 5 stopword lists (zh hits are 0 on this corpus but the
    // list participates in the vote, so it appears in the SQL too). ----
    Q("q35_docs_langid_quality",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        docs.select(col("doc_id"), col("lang"),
            TextFunctions.langId(col("text")).as("predicted_lang"),
            TextFunctions.qualityScore(col("text")).as("quality"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, trim(text) AS tt,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        scored AS (
          SELECT doc_id, lang,
            len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is'))) AS n_en,
            len(list_filter(tk, t -> t IN ('der','die','das','und','ist','nicht'))) AS n_de,
            len(list_filter(tk, t -> t IN ('el','la','de','que','y','es'))) AS n_es,
            len(list_filter(tk, t -> t IN ('le','la','les','et','est','que'))) AS n_fr,
            len(list_filter(tk, t -> t IN ('的','是','了','在','我'))) AS n_zh,
            length(tt) AS n_chars, len(tk) AS n_tokens,
            length(regexp_replace(lower(tt), '[^a-z]', '', 'g')) AS n_alpha
          FROM d)
        SELECT doc_id, lang,
          CASE WHEN n_en + n_de + n_es + n_fr + n_zh = 0 THEN 'und'
               WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr AND n_en >= n_zh THEN 'en'
               WHEN n_de >= n_es AND n_de >= n_fr AND n_de >= n_zh THEN 'de'
               WHEN n_es >= n_fr AND n_es >= n_zh THEN 'es'
               WHEN n_fr >= n_zh THEN 'fr'
               ELSE 'zh' END AS predicted_lang,
          round(0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
              + 0.4 * CAST(n_alpha AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0)
              + 0.2 * (CASE WHEN CAST(n_chars AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)
                            BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
              6) AS quality
        FROM scored ORDER BY doc_id""")),

    // ---- q59: PERCENTILE quality cutoff — Gopher-style corpus
    // trimming where the threshold is a per-language distribution
    // statistic (p10), not a constant. Exact interpolated percentile:
    // Spark `percentile` and DuckDB `quantile_cont` share the
    // (n-1)*p + lerp definition, and the inputs are the round-6 quality
    // scores both engines already agree on, so the cutoff replays to
    // the bit. Scale shape: one groupBy for the per-language cuts
    // (25 rows), broadcast back — the corpus never shuffles; the scored
    // frame is checkpoint-fenced so the regex-heavy score isn't
    // re-inlined into the join and filter. ----
    Q("q59_docs_quality_cutoff",
      (s, dir) => {
        val scored = fan(t(s, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            TextFunctions.qualityScore(col("text")).as("quality"))
          .localCheckpoint()
        // exact percentile from the VALUE HISTOGRAM (quality is on a
        // rounded 1e-6 grid): bounded aggregate state, unlike Spark's
        // percentile() which buffers every row's value per group —
        // interpolation is bit-identical (StatsSpec), oracle unchanged
        val cuts = graft.ext.Stats.percentileDiscrete(
          scored, Seq("lang"), "quality", 0.1, as = "p10")
        scored.join(broadcast(cuts), "lang")
          .select(col("doc_id"), col("lang"), col("quality"),
            round(col("p10"), 6).as("p10"),
            (col("quality") >= col("p10")).as("keep"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, trim(text) AS tt,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        scored AS (
          SELECT doc_id, lang,
            round(0.4 * least(CAST(length(tt) AS DOUBLE) / 500.0, 1.0)
                + 0.4 * CAST(length(regexp_replace(lower(tt), '[^a-z]', '', 'g')) AS DOUBLE)
                      / greatest(CAST(length(tt) AS DOUBLE), 1.0)
                + 0.2 * (CASE WHEN CAST(length(tt) AS DOUBLE)
                                   / greatest(CAST(len(tk) AS DOUBLE), 1.0)
                              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
                6) AS quality
          FROM d),
        cuts AS (
          SELECT lang, quantile_cont(quality, 0.1) AS p10
          FROM scored GROUP BY lang)
        SELECT s.doc_id, s.lang, s.quality, round(c.p10, 6) AS p10,
               s.quality >= c.p10 AS keep
        FROM scored s JOIN cuts c USING (lang)
        ORDER BY s.doc_id""")),

    // ---- q114: bigram LM with STUPID BACKOFF (LangModel.stupidBackoff,
    // Brants et al. 2007) — the rung above q78's unigram filter: fit on
    // the even-id half, score EVERY doc, so odd docs genuinely exercise
    // the 0.4-weighted backoff branch (self-scoring would never back
    // off — every observed bigram has c >= 1). The oracle replays fit
    // counts, the per-instance CASE, and the weighted fold. ----
    Q("q114_docs_stupid_backoff",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        graft.ext.LangModel.stupidBackoff(docs, "doc_id", "text",
            fitCorpus = docs.where(col("doc_id") % 2 === 0))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("sb_cross_entropy"), 6).as("sb_cross_entropy"),
            round(col("sb_perplexity"), 2).as("sb_perplexity"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        fit AS (SELECT * FROM tk WHERE doc_id % 2 = 0),
        uni AS (
          SELECT term, count(*) AS cu
          FROM (SELECT unnest(tk) AS term FROM fit) GROUP BY term),
        tot AS (SELECT sum(cu) * 1.0 AS n, count(*) * 1.0 AS v FROM uni),
        bigf AS (
          SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS cb
          FROM fit, UNNEST(range(1, greatest(len(tk), 1))) AS r(i)
          GROUP BY 1, 2),
        binst AS (
          SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2, count(*) AS n
          FROM tk, UNNEST(range(1, greatest(len(tk), 1))) AS r(i)
          GROUP BY 1, 2, 3),
        sc AS (
          SELECT b.doc_id, b.n,
                 CASE WHEN f.cb IS NOT NULL AND u1.cu IS NOT NULL
                      THEN CAST(f.cb AS DOUBLE) / CAST(u1.cu AS DOUBLE)
                      ELSE 0.4 * (coalesce(u2.cu, 0) + 1)
                           / (tot.n + tot.v) END AS s
          FROM binst b
          LEFT JOIN bigf f ON f.w1 = b.w1 AND f.w2 = b.w2
          LEFT JOIN uni u1 ON u1.term = b.w1
          LEFT JOIN uni u2 ON u2.term = b.w2
          CROSS JOIN tot)
        SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
               round(sum(n * -ln(s)) / sum(n), 6) AS sb_cross_entropy,
               round(exp(sum(n * -ln(s)) / sum(n)), 2) AS sb_perplexity
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- q115: TEMPERATURE-sampled mixture (Sampling.temperature,
    // the XLM/mT5 multilingual rule): stratum shares follow n_s^0.5,
    // lifting low-resource languages — the binding (smallest) stratum
    // keeps everything, larger ones thin toward sqrt proportions. The
    // whole decision is (row id, salt, corpus counts)-pure: the oracle
    // re-derives counts, sqrt weights, the binding scale, the 8-hex
    // thresholds, and every per-row keep decision. ----
    Q("q115_docs_temperature_mixture",
      (s, dir) => {
        Sampling.temperature(t(s, dir, "documents"), "doc_id", "lang",
            alpha = 0.5, salt = "temp")
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some("""
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
        lam AS (SELECT min(CAST(n AS DOUBLE) / wt) AS lam FROM w),
        cuts AS (
          SELECT lang,
                 CASE WHEN CAST(floor(lam.lam * wt / CAST(n AS DOUBLE)
                                      * 4294967296.0) AS BIGINT)
                           >= 4294967296
                      THEN 'g'
                      ELSE lpad(lower(hex(CAST(floor(lam.lam * wt
                             / CAST(n AS DOUBLE) * 4294967296.0)
                             AS BIGINT))), 8, '0') END AS cut
          FROM w CROSS JOIN lam)
        SELECT d.doc_id, d.lang, d.source
        FROM documents d JOIN cuts c ON d.lang = c.lang
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8)
              < c.cut
        ORDER BY d.doc_id""")),

    // ---- q116: FUZZY decontamination (Decontam.fuzzyContaminated) —
    // q68 catches verbatim n-gram leakage; this catches paraphrased/
    // extended leakage by full-document Jaccard against each benchmark
    // doc (the benchmark here is an EXTENDED mutant of every 37th doc,
    // so no corpus doc matches verbatim but the sources sit at
    // J ≈ 0.9). Inverted-index join across the two sides, benchmark
    // broadcast, exact Jaccard on candidates only; attribution is the
    // deterministic (max J, min bench id) witness. ----
    Q("q116_docs_fuzzy_decontam",
      (s, dir) => {
        import graft.ext.Decontam
        val base = fan(t(s, dir, "documents"))
        val bench = base.where(col("doc_id") % 37 === 0)
          .select(col("doc_id").as("bid"),
            concat(col("text"), lit(" zq zq zq")).as("btext"))
        Decontam.fuzzyContaminated(base, "doc_id", "text",
            bench, "bid", "btext", n = 3, minJaccard = 0.5)
          .orderBy("doc_id")
      },
      Some("""
        WITH bench AS (
          SELECT doc_id AS bid, text || ' zq zq zq' AS btext
          FROM documents WHERE doc_id % 37 = 0),
        ctk AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents),
        btk AS (
          SELECT bid, string_split_regex(lower(trim(btext)), '\s+') AS tk
          FROM bench),
        cp AS (
          SELECT DISTINCT doc_id, sh FROM ctk,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        bp AS (
          SELECT DISTINCT bid, sh FROM btk,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        csz AS (SELECT doc_id, count(*) AS sz FROM cp GROUP BY doc_id),
        bsz AS (SELECT bid, count(*) AS bsz FROM bp GROUP BY bid),
        j0 AS (
          SELECT i.doc_id, i.bid,
                 round(CAST(i.common AS DOUBLE)
                       / CAST(c.sz + b.bsz - i.common AS DOUBLE), 6) AS j
          FROM (SELECT cp.doc_id, bp.bid, count(*) AS common
                FROM cp JOIN bp USING (sh) GROUP BY 1, 2) i
          JOIN csz c ON c.doc_id = i.doc_id
          JOIN bsz b ON b.bid = i.bid),
        j AS (SELECT * FROM j0 WHERE j >= 0.5),
        hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits
                 FROM j GROUP BY doc_id),
        wit AS (
          SELECT doc_id, bid, j,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY j DESC, bid) AS rn
          FROM j)
        SELECT h.doc_id, h.n_bench_hits, w.bid AS worst_bench,
               w.j AS max_jaccard
        FROM hits h JOIN wit w ON w.doc_id = h.doc_id AND w.rn = 1
        ORDER BY h.doc_id""")),

    // ---- q117: the CCNet HEAD/MIDDLE/TAIL split — per-language
    // perplexity terciles (Wenzek et al. 2020: score with an LM, split
    // each language at the 1/3 and 2/3 perplexity quantiles; training
    // recipes then weight head > middle > tail). Composes q78's
    // unigram scorer with the histogram-exact percentile (bounded
    // aggregate state — q59's machinery), cutoffs broadcast back.
    // Oracle: DuckDB quantile_cont reproduces Spark's Percentile
    // interpolation on the rounded-2 grid (the q59-proven identity). ----
    Q("q117_docs_ccnet_ppl_buckets",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val scored = graft.ext.LangModel.selfScore(docs, "doc_id", "text")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("doc_id"), col("lang"),
            round(col("perplexity"), 2).as("ppl"))
          .localCheckpoint() // one scoring pass feeds cutoffs AND labels
        val c33 = graft.ext.Stats.percentileDiscrete(
          scored, Seq("lang"), "ppl", 1.0 / 3, as = "c33")
        val c67 = graft.ext.Stats.percentileDiscrete(
          scored, Seq("lang"), "ppl", 2.0 / 3, as = "c67")
        scored.join(broadcast(c33), "lang").join(broadcast(c67), "lang")
          .select(col("doc_id"), col("lang"), col("ppl"),
            round(col("c33"), 6).as("c33"), round(col("c67"), 6).as("c67"),
            when(col("ppl") <= col("c33"), lit("head"))
              .when(col("ppl") <= col("c67"), lit("middle"))
              .otherwise(lit("tail")).as("bucket"))
          .orderBy("doc_id")
      },
      Some("""
        WITH terms AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
          FROM documents WHERE trim(text) <> ''),
        counts AS (SELECT term, count(*) AS c FROM terms GROUP BY term),
        totals AS (SELECT sum(c) * 1.0 AS nt, count(*) * 1.0 AS nv
                   FROM counts),
        lp AS (SELECT term, ln((c + 1) / (nt + nv)) AS logp
               FROM counts, totals),
        scored AS (
          SELECT t.doc_id, d.lang,
                 round(exp(avg(-lp.logp)), 2) AS ppl
          FROM terms t JOIN lp ON t.term = lp.term
          JOIN documents d ON d.doc_id = t.doc_id
          GROUP BY t.doc_id, d.lang),
        cuts AS (
          SELECT lang, quantile_cont(ppl, 1.0 / 3) AS c33,
                 quantile_cont(ppl, 2.0 / 3) AS c67
          FROM scored GROUP BY lang)
        SELECT s.doc_id, s.lang, s.ppl,
               round(c.c33, 6) AS c33, round(c.c67, 6) AS c67,
               CASE WHEN s.ppl <= c.c33 THEN 'head'
                    WHEN s.ppl <= c.c67 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored s JOIN cuts c USING (lang)
        ORDER BY s.doc_id""")),

    // ---- q118: RAG chunking with OVERLAP (Packing.chunkOverlap) —
    // 32-token windows advancing by 24 (8-token overlap), the universal
    // pre-embedding step of retrieval pipelines; the closed-form chunk
    // count guarantees tail coverage with no subset chunks. Pure
    // codegen'd array arithmetic, one explode; every chunk string sits
    // inside the hash compare. ----
    Q("q118_docs_chunk_overlap",
      (s, dir) => {
        Packing.chunkOverlap(fan(t(s, dir, "documents")),
            "doc_id", "text", chunk = 32, stride = 24)
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        nn AS (SELECT doc_id, tk, len(tk) AS n FROM tk WHERE len(tk) > 0),
        ch AS (
          SELECT doc_id, i AS chunk_idx,
                 list_slice(tk, i * 24 + 1,
                            least(i * 24 + 32, CAST(n AS BIGINT))) AS ck
          FROM nn, UNNEST(range(0,
            1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS t(i))
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(ck) AS BIGINT) AS chunk_tokens,
               array_to_string(ck, ' ') AS chunk_text
        FROM ch ORDER BY doc_id, chunk_idx""")),

    // ---- q119: positional PROXIMITY search (Retrieval.proximity) —
    // Lucene's sloppy-phrase rung above q84's bag-of-words BM25: docs
    // where 'spark' and 'query' co-occur within 5 tokens, closest-pair
    // distance as the signal. Only the two terms' positional postings
    // survive the scan filter; the pair join is per-doc and
    // tf-bounded. Oracle replays positions, the pair minimum, and the
    // window cut. ----
    Q("q119_docs_proximity_search",
      (s, dir) => {
        graft.ext.Retrieval.proximity(fan(t(s, dir, "documents")),
            "doc_id", "text", "spark", "query", window = 5)
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        pos AS (
          SELECT doc_id, p, tk[p] AS t
          FROM tk, UNNEST(range(1, len(tk) + 1)) AS r(p)
          WHERE tk[p] IN ('spark', 'query')),
        pairs AS (
          SELECT a.doc_id,
                 count(DISTINCT a.p) AS n_a, count(DISTINCT b.p) AS n_b,
                 min(abs(a.p - b.p)) AS min_dist
          FROM pos a JOIN pos b
            ON a.doc_id = b.doc_id AND a.t = 'spark' AND b.t = 'query'
          GROUP BY a.doc_id)
        SELECT doc_id, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(min_dist AS BIGINT) AS min_dist
        FROM pairs WHERE min_dist <= 5
        ORDER BY doc_id""")),

    // ---- q36: content fingerprint rollup (rolling-hash analog via md5
    // of normalized text): duplicate-group inventory. ----
    Q("q36_docs_fingerprint",
      (s, dir) => {
        val docs = withExactDups(fan(t(s, dir, "documents")))
        docs.select(TextFunctions.fingerprint(col("text")).as("fp"),
            col("doc_id"))
          .groupBy("fp")
          .agg(count(lit(1)).cast("long").as("n_copies"),
            min(col("doc_id")).as("first_doc"))
          .where(col("n_copies") > 1)
          .orderBy("first_doc")
      },
      Some(s"""
        WITH u AS ($dupUnionSql)
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               CAST(count(*) AS BIGINT) AS n_copies,
               min(doc_id) AS first_doc
        FROM u GROUP BY 1 HAVING count(*) > 1
        ORDER BY first_doc""")),

    // ---- q37: SimHash 64-bit fingerprints + banded hamming near-dup
    // pairs (16-bit chunks keep the pair search sub-quadratic: hamming
    // ≤ 3 ⇒ one of 4 chunks equal). Oracle-able form: hamming == 0
    // candidates verified by exact token-MULTISET equality — equal
    // multisets imply equal simhash (it is a function of the multiset),
    // so every true pair collides in all four chunks (recall is
    // structural, not probabilistic) and the verify step discards any
    // 64-bit collision between different multisets. DuckDB brute-forces
    // the same criterion on sorted token lists; hamming-≤3 locality at
    // sub-exact thresholds stays covered by ExtSpec. ----
    Q("q37_docs_simhash",
      (s, dir) => {
        val docs = withExactDups(fan(t(s, dir, "documents")))
        val sigs = NearDup.simhash(docs, "doc_id", "text")
        val chunks = sigs.select(col("_id"), col("simhash"),
          explode(array((0 until 4).map(i =>
            struct(lit(i).as("ci"),
              shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))
                .as("ch"))): _*)).as("c"))
          .select(col("_id"), col("simhash"),
            col("c.ci").as("ci"), col("c.ch").as("ch"))
        val cands = chunks.as("x").join(chunks.as("y"),
            col("x.ci") === col("y.ci") && col("x.ch") === col("y.ch") &&
              col("x._id") < col("y._id"))
          .select(col("x._id").as("id1"), col("y._id").as("id2"),
            NearDup.hamming(col("x.simhash"), col("y.simhash")).as("hamming"))
          .distinct()
          .where(col("hamming") === 0)
        val toks = docs.select(col("doc_id"),
          array_sort(TextFunctions.tokens(col("text"))).as("_tk"))
        cands // exact verify: candidate hamming-0 pairs → equal multisets
          .join(toks.select(col("doc_id").as("id1"), col("_tk").as("tk1")), "id1")
          .join(toks.select(col("doc_id").as("id2"), col("_tk").as("tk2")), "id2")
          .where(col("tk1") === col("tk2"))
          .select(col("id1"), col("id2"), col("hamming").cast("int").as("hamming"))
          .orderBy("id1", "id2")
      },
      Some(s"""
        WITH u AS ($dupUnionSql),
        toks AS (
          SELECT doc_id,
                 list_sort(string_split_regex(lower(trim(text)), '\\s+')) AS tk
          FROM u WHERE trim(text) <> '')
        SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(0 AS INT) AS hamming
        FROM toks a JOIN toks b ON a.tk = b.tk AND a.doc_id < b.doc_id
        ORDER BY id1, id2""")),

    // ---- q38: HLL distinct-count surface. At these cardinalities
    // (|langs| ≤ 5, |sources| ≤ 10) the HLL sketch is exact, so the
    // DuckDB oracle can compare against exact COUNT(DISTINCT). ----
    Q("q38_approx_distinct",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        docs.groupBy("source")
          .agg(
            approx_count_distinct(col("lang")).as("n_langs"),
            count_distinct(col("lang")).as("n_langs_exact"),
            count(lit(1)).as("n_docs"))
          .orderBy("source")
      },
      Some("""
        SELECT source,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs_exact,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- q40: embedding-cosine near-dup pairs — dedup by embedding:
    // LSH-bucketed self-join + exact cosine verification (no corpus²
    // scan). Planted EXACT vector copies make recall STRUCTURAL (an
    // identical vector hashes into identical buckets in every table —
    // random-projection LSH is a deterministic function of the vector —
    // and sits at distance 0 < radius), which is what lets DuckDB
    // brute-force the same criterion as an oracle: the raw corpus's max
    // pairwise cosine is ~0.51, so nothing else can reach the 0.9999
    // verify threshold and every emitted pair is a planted copy.
    // Perturbed-copy recall stays covered by ExtSpec. ----
    Q("q40_embed_cosine_neardup",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val mutants = emb.where(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L)
        Similarity.cosineNearDupPairs(
            emb.unionByName(mutants), "vec_id", "embedding",
            minCosine = 0.9999)
          .orderBy("id1", "id2")
      },
      Some("""
        WITH u AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000, embedding
          FROM embeddings WHERE vec_id % 10 = 0),
        pairs AS (
          SELECT a.vec_id AS id1, b.vec_id AS id2,
                 round(list_dot_product(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                              a.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(b.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]))),
                       6) AS cosine
          FROM u a JOIN u b ON a.vec_id < b.vec_id)
        SELECT id1, id2, cosine FROM pairs
        WHERE cosine >= 0.9999 ORDER BY id1, id2""")),

    // ---- q41: IVF top-k in its exact configuration (nProbe = nCells:
    // every cell probed ⇒ recall 1 ⇒ the brute-force oracle applies
    // verbatim — the query exercises the coarse-quantize → probe →
    // bucketed candidate-join machinery; ExtSpec covers the recall<1
    // fast path). ----
    Q("q41_embed_ivf_topk",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfTopK(emb, "vec_id", "embedding",
            queries, "qid", "qvec", k = 5, nCells = 8, nProbe = 8)
          .select(col("qid"), col("rank").cast("long").as("rank"),
            col("id"), col("cosine"))
          .orderBy("qid", "rank")
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
          FROM embeddings WHERE vec_id % 50 = 0),
        scored AS (
          SELECT q.qid, e.vec_id AS id,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, rank, id, cosine FROM ranked
        WHERE rank <= 5 ORDER BY qid, rank""")),

    // ---- q176: the ANN stack's RECALL FLOOR under the correctness
    // gate. q41 probes every cell (recall 1, oracle applies verbatim);
    // here ivfTopK runs at PARTIAL probe (4 of 16 cells) and its
    // recall@5 against the INDEPENDENT brute-force truth
    // (bruteForceTopK — a different code path, so a bug in either side
    // breaks the gate) must clear a floor chosen well above broken-
    // index behavior: measured recall is 0.66/0.70/0.545 at
    // sf0.001/0.01/0.1, while a garbage quantizer degenerates to
    // ~nProbe/nCells = 0.25 — the 0.4 floor separates them with margin
    // on both sides. The oracle pins the STRUCTURE (query count from
    // the data, the configuration constants, met = TRUE), so an index
    // regression flips `met` and breaks the HASH, not a tolerance.
    // The only cross-joins are 1-row scalar attachments. ----
    Q("q176_embed_ivf_recall_gate",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
            queries, "qid", "qvec", k = 5, nCells = 16, nProbe = 4)
          .select(col("qid"), col("id"))
        val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "qid", "qvec", k = 5)
          .select(col("qid").as("tqid"), col("id").as("tid"))
        val hits = ivf.join(truth,
          ivf("qid") === truth("tqid") && ivf("id") === truth("tid"))
        hits.agg(count(lit(1)).as("hits"))
          .join(queries.agg(count(lit(1)).as("n_queries")))
          .select(col("n_queries"),
            lit(5).as("k"), lit(16).as("n_cells"), lit(4).as("n_probe"),
            lit(0.4).as("recall_floor"),
            (col("hits") / (col("n_queries") * 5) >= 0.4).as("met"))
      },
      Some("""
        SELECT count(*) AS n_queries, 5 AS k, 16 AS n_cells,
               4 AS n_probe, CAST(0.4 AS DOUBLE) AS recall_floor,
               TRUE AS met
        FROM embeddings WHERE vec_id % 50 = 0""")),

    // ---- q42: BPE-ish token counting — the tokenizer-approximation
    // regex (word / number / punctuation-run classes, optional leading
    // space, GPT-2-pattern shape) alongside whitespace tokens; per-doc
    // counts and corpus rollup. ----
    Q("q42_docs_token_counts",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val bpeish = " ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+"
        docs.select(col("doc_id"), col("lang"),
            TextFunctions.tokenCount(col("text")).as("ws_tokens"),
            regexp_count(lower(col("text")), lit(bpeish)).as("bpeish_tokens"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ws_tokens")).cast("long").as("total_ws"),
            sum(col("bpeish_tokens")).cast("long").as("total_bpeish"),
            round(avg(col("bpeish_tokens")), 2).as("avg_bpeish"))
          .orderBy("lang")
      },
      Some("""
        WITH d AS (
          SELECT lang,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(lower(trim(text)), '\s+'))
                 END AS ws_tokens,
                 len(regexp_extract_all(lower(text),
                     ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS bpeish_tokens
          FROM documents)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(ws_tokens) AS BIGINT) AS total_ws,
               CAST(sum(bpeish_tokens) AS BIGINT) AS total_bpeish,
               round(avg(bpeish_tokens), 2) AS avg_bpeish
        FROM d GROUP BY lang ORDER BY lang""")),

    // ---- q43: TF-IDF top terms per language — explode → document
    // frequency → idf join → per-(lang, term) scores → windowed top-5.
    // The df table is |vocab|-sized (small) → broadcast joins; ranking
    // on round(score, 6) + term keeps ties engine-stable. ----
    Q("q43_docs_tfidf_topterms",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        // corpus size IN-PLAN (broadcast 1-row count) — a driver-side
        // docs.count() would be an extra full pass over `documents`
        val nDocs = docs.agg(count(lit(1)).cast("double").as("_n_corpus"))
        val terms = docs.select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        val df_ = terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val tf = terms.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
        val scored = tf.join(broadcast(df_), "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf",
            round(col("tf") * log(col("_n_corpus") / col("df")), 6))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy("lang")
              .orderBy(col("tfidf").desc, col("term"))))
          .where(col("rank") <= 5)
          .select(col("lang"), col("rank").cast("long").as("rank"),
            col("term"), col("tfidf"))
          .orderBy("lang", "rank")
      },
      Some("""
        WITH terms AS (
          SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)),
                 '\s+')) AS term
          FROM documents WHERE trim(text) <> ''),
        df AS (
          SELECT term, count(*) AS df
          FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        tf AS (
          SELECT lang, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        scored AS (
          SELECT lang, tf.term,
                 round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df),
                       6) AS tfidf
          FROM tf JOIN df ON tf.term = df.term),
        ranked AS (
          SELECT lang, term, tfidf,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY tfidf DESC, term) AS rank
          FROM scored)
        SELECT lang, rank, term, tfidf FROM ranked
        WHERE rank <= 5 ORDER BY lang, rank""")),

    // ---- q44: frame sampling over binary payloads, expression-only
    // form (the oracle-able twin of Multimodal.sampleFrames): four
    // evenly spaced 16-byte windows per payload, fingerprinted — the
    // row-fanout shape of video frame extraction, no shuffle before the
    // final order. ----
    Q("q44_multimodal_frames",
      (s, dir) => {
        val win = 16
        val media = fan(t(s, dir, "documents")).select(
          col("doc_id").as("media_id"), col("text"),
          length(col("text")).as("len"))
        media
          .select(col("media_id"), col("text"), col("len"),
            explode(sequence(lit(0), lit(3))).as("frame_idx"))
          .withColumn("off",
            expr(s"greatest(len - $win, 0) * frame_idx DIV 3"))
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("off").cast("long").as("off"),
            md5(expr(s"substring(text, off + 1, $win)").cast("binary"))
              .as("frame_md5"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""
        WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len
                   FROM documents),
        f AS (SELECT media_id, text, len, unnest([0, 1, 2, 3]) AS frame_idx
              FROM m)
        SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(greatest(len - 16, 0) * frame_idx // 3 AS BIGINT) AS off,
               md5(substr(text, greatest(len - 16, 0) * frame_idx // 3 + 1,
                          16)) AS frame_md5
        FROM f ORDER BY media_id, frame_idx""")),

    // ---- q45: polynomial rolling-hash document fingerprint (the
    // fingerprinting rung below md5): left fold of acc*31 + code mod
    // 1e9+7 over the character stream — exact integer math in both
    // engines, no overflow (31 * (1e9+7) + 255 < 2^63). ----
    Q("q45_docs_rolling_fingerprint",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val codes = transform(
          sequence(lit(1), length(col("text"))),
          i => ascii(col("text").substr(i, lit(1))).cast("long"))
        val rh = aggregate(codes, lit(0L),
          (acc, c) => (acc * 31 + c) % 1000000007L)
        docs.select(col("doc_id"), rh.as("fingerprint"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // ---- q39: multimodal-column plumbing: text bytes as an opaque
    // binary payload + typed metadata struct; inline (expression-only)
    // feature extraction — byte length, content digest, modality tag.
    // The codec mapPartitions path (imageio + fallback) is exercised in
    // ExtSpec. ----
    Q("q39_multimodal_inline",
      (s, dir) => {
        val media = fan(t(s, dir, "documents")).select(
          col("doc_id").as("media_id"),
          col("text").cast("binary").as("content"),
          struct(lit("image").as("kind"), lit("image/fake").as("mime"),
            length(col("text")).cast("long").as("n_bytes")).as("meta"))
        graft.ext.Multimodal.inlineFeatures(media)
          .select(col("media_id"), col("kind"),
            col("n_bytes").cast("long").as("n_bytes"),
            col("content_md5"), col("fake_rate").cast("long").as("fake_rate"))
          .orderBy("media_id")
      },
      Some("""
        SELECT doc_id AS media_id, 'image' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(octet_length(encode(text)) % 44100 AS BIGINT) AS fake_rate
        FROM documents ORDER BY media_id""")),

    // ---- q66: PII REDACTION / text cleaning — the scrub pass of a
    // training pipeline. PII is planted deterministically (emails on
    // %7, URLs on %11, long digit runs on %13 — overlaps compose), then
    // masked by Cleaning.redact and counted per category on the same
    // staged masking order, all in codegen'd regexes on the scan (no
    // shuffle). The cleaned text is hash-compared via md5, so every
    // masked byte is inside the gate. ----
    Q("q66_docs_pii_redaction",
      (s, dir) => {
        import graft.ext.Cleaning
        val planted = fan(t(s, dir, "documents")).select(
          col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0,
              format_string(" contact user%d@mail.example.com now",
                col("doc_id"))).otherwise(""),
            when(col("doc_id") % 11 === 0,
              format_string(" see https://ex.org/p/%d?x=1 ok",
                col("doc_id"))).otherwise(""),
            when(col("doc_id") % 13 === 0,
              format_string(" call %d0123456 today",
                col("doc_id"))).otherwise("")).as("text"))
          .localCheckpoint() // fence: synthesized text feeds 5 regexes
        val counts = Cleaning.redactionCounts(col("text"))
        planted.select(
            col("doc_id") +:
            counts.map { case (nm, c) => c.cast("long").as(s"n_$nm") } :+
            md5(Cleaning.clean(col("text")).cast("binary")).as("clean_md5") :+
            length(Cleaning.clean(col("text"))).cast("long").as("clean_len"): _*)
          .orderBy("doc_id")
      },
      Some("""
        WITH planted AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 7 = 0
                 THEN printf(' contact user%d@mail.example.com now', doc_id)
                 ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                 THEN printf(' see https://ex.org/p/%d?x=1 ok', doc_id)
                 ELSE '' END
            || CASE WHEN doc_id % 13 = 0
                 THEN printf(' call %d0123456 today', doc_id)
                 ELSE '' END AS text
          FROM documents),
        masked AS (
          SELECT doc_id, text,
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g') AS m1
          FROM planted),
        masked2 AS (
          SELECT *, regexp_replace(m1, 'https?://[^ \t\r\n]+', '<URL>', 'g')
                    AS m2
          FROM masked)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_email,
          CAST(len(regexp_extract_all(m1, 'https?://[^ \t\r\n]+')) AS BIGINT)
            AS n_url,
          CAST(len(regexp_extract_all(m2, '[0-9]{7,}')) AS BIGINT) AS n_num,
          md5(trim(regexp_replace(
            regexp_replace(m2, '[0-9]{7,}', '<NUM>', 'g'),
            '[ \t\r\n]+', ' ', 'g'))) AS clean_md5,
          CAST(length(trim(regexp_replace(
            regexp_replace(m2, '[0-9]{7,}', '<NUM>', 'g'),
            '[ \t\r\n]+', ' ', 'g'))) AS BIGINT) AS clean_len
        FROM masked2 ORDER BY doc_id""")),

    // ---- q67: BUDGETED CORPUS SELECTION — per language, keep the
    // best-quality docs until a token budget is spent. The plan is the
    // bucketed two-phase form (Curation.takeByBudget): per-bucket sums
    // + a window over BUCKET AGGREGATES pick whole buckets; only the
    // one boundary bucket per group runs a per-row cumulative window —
    // no full-group window task anywhere (the q24-class killer this
    // operator exists to avoid). Oracle replays the row-exact
    // semantics with a plain window, which DuckDB can afford at
    // oracle scale. ----
    Q("q67_docs_token_budget",
      (s, dir) => {
        import graft.ext.Curation
        val scored = fan(t(s, dir, "documents")).select(
            col("doc_id"), col("lang"),
            TextFunctions.qualityScore(col("text")).as("quality"),
            TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
          .localCheckpoint() // fence: quality/toks feed the window+filter
        Curation.takeByBudget(scored, groups = Seq("lang"),
            leading = col("quality"), tie = Seq("doc_id"),
            cost = col("toks"), budget = 2000L)
          .select("doc_id", "lang", "quality", "toks")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, trim(text) AS tt,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        scored AS (
          SELECT doc_id, lang,
            round(0.4 * least(CAST(length(tt) AS DOUBLE) / 500.0, 1.0)
                + 0.4 * CAST(length(regexp_replace(lower(tt), '[^a-z]', '', 'g')) AS DOUBLE)
                      / greatest(CAST(length(tt) AS DOUBLE), 1.0)
                + 0.2 * (CASE WHEN CAST(length(tt) AS DOUBLE)
                                   / greatest(CAST(len(tk) AS DOUBLE), 1.0)
                              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
                6) AS quality,
            CAST(len(tk) AS BIGINT) AS toks
          FROM d),
        sel AS (
          SELECT *, sum(toks) OVER (PARTITION BY lang
                      ORDER BY quality DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
          FROM scored)
        SELECT doc_id, lang, quality, toks FROM sel
        WHERE cum <= 2000 ORDER BY doc_id""")),

    // ---- q68: BENCHMARK DECONTAMINATION — flag corpus docs whose
    // 5-gram shingles overlap the eval set (docs %37, plus planted
    // partial-contamination mutants that extend a benchmark doc).
    // Benchmark collapses to its DISTINCT shingle set and broadcasts;
    // the corpus never shuffles to discover overlap. ----
    Q("q68_docs_decontaminate",
      (s, dir) => {
        import graft.ext.Decontam
        val base = fan(t(s, dir, "documents"))
        val bench = base.where(col("doc_id") % 37 === 0)
        val corpus = base.unionByName(
          bench.select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" wholly novel suffix tokens appended"))
              .as("text"),
            col("lang"), col("source"), col("n_chars")))
        Decontam.overlap(corpus, "doc_id", "text",
            bench.select(col("text")), "text", n = 5)
          .select("doc_id", "n_shingles", "n_hit", "overlap")
          .orderBy("doc_id")
      },
      Some("""
        WITH u AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
                 text || ' wholly novel suffix tokens appended'
          FROM documents WHERE doc_id % 37 = 0),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 3, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                      || tk[i+3] || ' ' || tk[i+4])) AS t(sh)),
        bsh AS (
          SELECT DISTINCT sh FROM post
          WHERE doc_id % 37 = 0 AND doc_id < 1000000),
        sizes AS (
          SELECT doc_id, count(*) AS n_shingles FROM post GROUP BY doc_id),
        hits AS (
          SELECT p.doc_id, count(*) AS n_hit
          FROM post p JOIN bsh USING (sh) GROUP BY p.doc_id)
        SELECT s.doc_id,
               CAST(s.n_shingles AS BIGINT) AS n_shingles,
               CAST(h.n_hit AS BIGINT) AS n_hit,
               round(CAST(h.n_hit AS DOUBLE)
                     / CAST(s.n_shingles AS DOUBLE), 6) AS overlap
        FROM sizes s JOIN hits h USING (doc_id)
        ORDER BY s.doc_id""")),

    // ---- q69: MIXTURE REBALANCING — the largest subcorpus matching
    // declared source weights. λ* = min(n_s/w_s) and the per-stratum
    // hex cuts are computed IN-PLAN (tiny agg → broadcast scalar →
    // broadcast cut dim): no driver collect anywhere, and the kept set
    // is a pure function of (doc_id, salt, corpus counts) that DuckDB
    // replays bit-exactly — including the float path to the cut, which
    // both engines evaluate with the same IEEE association. Undeclared
    // sources drop (a mixture DECLARES its parts). ----
    Q("q69_docs_mixture_rebalance",
      (s, dir) => {
        Sampling.rebalance(fan(t(s, dir, "documents")), "doc_id", "source",
            Seq("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0,
              "src3" -> 0.5), salt = "mix")
          .select("doc_id", "source", "lang")
          .orderBy("doc_id")
      },
      Some("""
        WITH w(source, wt) AS (
          VALUES ('src0', CAST(2.0 AS DOUBLE)), ('src1', CAST(1.0 AS DOUBLE)),
                 ('src2', CAST(1.0 AS DOUBLE)), ('src3', CAST(0.5 AS DOUBLE))),
        c AS (
          SELECT d.source, wt, count(*) AS n
          FROM documents d JOIN w USING (source)
          GROUP BY d.source, wt),
        lam AS (SELECT min(CAST(n AS DOUBLE) / wt) AS lam FROM c),
        cuts AS (
          SELECT source,
            CASE WHEN CAST(floor(lam * wt / CAST(n AS DOUBLE)
                               * 4294967296.0) AS BIGINT) >= 4294967296
                 THEN 'g'
                 ELSE printf('%08x',
                   CAST(floor(lam * wt / CAST(n AS DOUBLE)
                            * 4294967296.0) AS BIGINT))
            END AS cut
          FROM c, lam)
        SELECT d.doc_id, d.source, d.lang
        FROM documents d JOIN cuts USING (source)
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8) < cut
        ORDER BY d.doc_id""")),

    // ---- q71: CROSS-DOC REPEATED SPANS — the exact-substring rung of
    // the dedup ladder (suffix-array dedup's distributed shape): every
    // 12-token window in ≥2 distinct docs, with document frequency and
    // carrier range. One shuffle on the span, no self-join — posting
    // lists at this n are near-unique, unlike 3-gram shingles. ----
    Q("q71_docs_repeated_spans",
      (s, dir) => {
        val docs = withNearDups(fan(t(s, dir, "documents")))
        NearDup.crossDocSpans(docs, "doc_id", "text", n = 12, minDocs = 2)
          .orderBy("span")
      },
      Some {
        val spanConcat = (0 until 12).map(o => s"tk[i+$o]")
          .mkString(" || ' ' || ")
        s"""
        WITH u AS ($nearDupUnionSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 10, 1)),
                 i -> $spanConcat)) AS t(sh))
        SELECT sh AS span, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM post GROUP BY sh HAVING count(*) >= 2 ORDER BY span"""
      }),

    // ---- q72: TOKENIZER VOCABULARY INDUCTION — per-language top-V
    // tokens by occurrence count plus the coverage each vocab slot buys
    // (count / total occurrences): the stats a BPE/vocab trainer reads
    // off a corpus first. One shuffle to token counts (map-side
    // combine), rank window over the per-lang COUNT table (vocab-
    // bounded, not row-bounded), totals broadcast back. ----
    Q("q72_docs_vocab_induction",
      (s, dir) => {
        val tok = fan(t(s, dir, "documents"))
          .select(col("lang"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
        val counts = tok.groupBy("lang", "term")
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // one token pass feeds BOTH rank and totals
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("term").asc)
        // totals from the vocab-bounded count table, not a second
        // tokenize+explode pass over the corpus
        val totals = counts.groupBy("lang").agg(sum("n").as("total"))
        counts.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 5)
          .join(broadcast(totals), "lang")
          .select(col("lang"), col("rank").cast("long").as("rank"),
            col("term"), col("n").cast("long").as("n"),
            round(col("n").cast("double") / col("total").cast("double"), 6)
              .as("coverage"))
          .orderBy("lang", "rank")
      },
      Some("""
        WITH tok AS (
          SELECT lang, t.term FROM (
            SELECT lang,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(lower(trim(text)), '\s+')
                   END AS tk
            FROM documents), UNNEST(tk) AS t(term)),
        counts AS (
          SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term),
        ranked AS (
          SELECT lang, term, n,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n DESC, term) AS rank
          FROM counts),
        totals AS (SELECT lang, count(*) AS total FROM tok GROUP BY lang)
        SELECT r.lang, CAST(r.rank AS BIGINT) AS rank, r.term,
               CAST(r.n AS BIGINT) AS n,
               round(CAST(r.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
                 AS coverage
        FROM ranked r JOIN totals t USING (lang)
        WHERE r.rank <= 5
        ORDER BY r.lang, r.rank""")),

    // ---- q75: tokenizer APPLICATION — the deployment half of q72's
    // induction: ids 1..V for the global top-50 tokens (count desc,
    // token asc ties), every doc encoded as its ordered id sequence
    // with OOV → 0, emitted as a comma-joined string so every id sits
    // inside the hash compare. Empty docs encode to the empty
    // sequence (the encoder is total). The oracle replays the same
    // rank → id assignment and re-assembles with string_agg ORDER BY
    // position. ----
    Q("q75_docs_tokenize_ids",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val vocab = Vocab.induce(docs, "text", vocabSize = 50)
        Vocab.encode(docs, "doc_id", "text", vocab)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        tok AS (
          SELECT doc_id, i AS pos, tk[i] AS token
          FROM d, UNNEST(range(1, len(tk) + 1)) AS r(i)),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        vocab AS (
          SELECT token,
                 row_number() OVER (ORDER BY n DESC, token) AS id
          FROM counts ORDER BY n DESC, token LIMIT 50),
        mapped AS (
          SELECT t.doc_id, t.pos, coalesce(v.id, 0) AS tid
          FROM tok t LEFT JOIN vocab v USING (token)),
        agg AS (
          SELECT doc_id, count(*) AS n_tokens,
                 sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS n_oov,
                 string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids
          FROM mapped GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
               coalesce(a.ids, '') AS ids
        FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id""")),

    // ---- q73: SemDeDup — SEMANTIC dedup by embedding clustering
    // (cell the corpus with the sampled coarse quantizer, exact cosine
    // within cells, connected components → keep one doc per group).
    // Oracle-able form: the planted duplicates are EXACT copies, so
    // they land in the SAME k-means cell unconditionally (identical
    // vector ⇒ identical assignment) at cosine ~1, and the corpus's max
    // natural pairwise cosine is ~0.51 — far under the 0.95 threshold —
    // so the semantic groups are exactly the planted copy-groups and
    // DuckDB can brute-force all pairs + recursive transitive closure.
    // Cell-boundary recall on PERTURBED copies stays covered by
    // ExtSpec. Copies of every 20th vector appear twice (three-member
    // groups), exercising cluster_size > 2. ----
    Q("q73_embed_semantic_dedup",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val c1 = emb.where(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L)
        val c2 = emb.where(col("vec_id") % 20 === 0)
          .withColumn("vec_id", col("vec_id") + 2000000L)
        Similarity.semDeDup(
            emb.unionByName(c1).unionByName(c2), "vec_id", "embedding",
            minCosine = 0.95, nCells = 8)
          .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
            col("is_kept"))
          .orderBy("vec_id")
      },
      Some("""
        WITH RECURSIVE
        u AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000, embedding FROM embeddings
          WHERE vec_id % 10 = 0
          UNION ALL
          SELECT vec_id + 2000000, embedding FROM embeddings
          WHERE vec_id % 20 = 0),
        pairs AS (
          SELECT a.vec_id AS id1, b.vec_id AS id2
          FROM u a JOIN u b ON a.vec_id < b.vec_id
          WHERE list_dot_product(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                       a.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(b.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]))) >= 0.95),
        edges AS (
          SELECT id1 AS s, id2 AS d FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(src, dst) AS (
          SELECT vec_id, vec_id FROM u
          UNION
          SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s),
        comp AS (
          SELECT src AS vec_id, min(dst) AS cluster_id
          FROM reach GROUP BY src)
        SELECT vec_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size,
               vec_id = cluster_id AS is_kept
        FROM comp ORDER BY vec_id""")),

    // ---- q78: LM-perplexity quality scoring (the CCNet/KenLM curation
    // rung): a unigram model with add-one smoothing is fit on the
    // corpus IN-PLAN (one count shuffle; totals fold to a broadcast
    // scalar), then every doc is priced by mean -ln p(token). Fit and
    // score are both relational, so DuckDB replays the identical
    // model — the smoothing arithmetic, not just the plumbing, is under
    // the hash gate. Blank docs have no distribution and drop on both
    // sides. ----
    Q("q78_docs_lm_perplexity",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        graft.ext.LangModel.selfScore(docs, "doc_id", "text")
          .select(col("doc_id"),
            col("n_tokens"),
            round(col("cross_entropy"), 6).as("cross_entropy"),
            round(col("perplexity"), 2).as("perplexity"))
          .orderBy("doc_id")
      },
      Some("""
        WITH terms AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
          FROM documents WHERE trim(text) <> ''),
        counts AS (SELECT term, count(*) AS c FROM terms GROUP BY term),
        totals AS (SELECT sum(c) * 1.0 AS nt, count(*) * 1.0 AS nv
                   FROM counts),
        lp AS (SELECT term, ln((c + 1) / (nt + nv)) AS logp
               FROM counts, totals)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(-lp.logp), 6) AS cross_entropy,
               round(exp(avg(-lp.logp)), 2) AS perplexity
        FROM terms t JOIN lp ON t.term = lp.term
        GROUP BY t.doc_id
        ORDER BY t.doc_id""")),

    // ---- q84: BM25 ranked retrieval (Retrieval.bm25TopK) — the
    // Lucene/Elasticsearch default scorer as a declarative plan. Only
    // query-term postings ever shuffle (the isin filter rides the
    // explode, before any exchange), df is a |terms|-row broadcast,
    // corpus constants fold to one broadcast scalar row, and the cut is
    // TakeOrdered (no global sort, no single-partition window). Scores
    // round to 6 dp BEFORE the top-k boundary so the cut is
    // engine-deterministic; the oracle replays idf/tf normalization
    // arithmetic exactly. ----
    Q("q84_docs_bm25_topk",
      (s, dir) => {
        graft.ext.Retrieval.bm25TopK(fan(t(s, dir, "documents")),
            "doc_id", "text",
            Seq("join", "vector", "stream", "spark", "customer"), 25)
          .select(col("id").as("doc_id"), col("n_terms_hit"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, tk FROM d),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                         avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl)
          WHERE term IN ('join', 'vector', 'stream', 'spark', 'customer')
          GROUP BY doc_id, dl, term),
        dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                  FROM tf GROUP BY term)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
               round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                         * tf * 2.2
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                     6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 25""")),

    // ---- q85: HTML boilerplate removal (Cleaning.stripHtml) — the
    // extraction pass that precedes every web-corpus curation ladder.
    // Each doc is wrapped in deterministic markup IN-PLAN (head/style
    // block, comment spanning a newline, a script whose BODY contains a
    // stray `</p>` and a free-standing `<` — the canaries that catch a
    // tag-only stripper), then stripped: script/style/comments lose
    // their content, tags become word breaks, the entity table decodes
    // single-pass (&amp; last), whitespace collapses. Exact string
    // equality against DuckDB replaying the same Java∩RE2 patterns. ----
    Q("q85_docs_html_clean",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><style type=\"text/css\">p { color: red; }" +
            "</style></head><body><!-- nav\nboilerplate -->" +
            "<div id=\"main\"><p>"), col("text"),
          lit("</p></div><script>var x = 1 < 2 && \"</p>\" != null;" +
            "</script><p>&amp;lt; &lt;tail&gt; &nbsp;&quot;end&quot; " +
            "it&#39;s</p></body></html>"))
        fan(t(s, dir, "documents"))
          .select(col("doc_id"),
            graft.ext.Cleaning.stripHtml(html).as("clean_text"))
          .select(col("doc_id"), col("clean_text"),
            length(col("clean_text")).cast("long").as("clean_len"))
          .orderBy("doc_id")
      },
      Some("""
        WITH wrapped AS (
          SELECT doc_id,
            '<html><head><title>Doc ' || doc_id
            || '</title><style type="text/css">p { color: red; }'
            || '</style></head><body><!-- nav' || chr(10)
            || 'boilerplate --><div id="main"><p>' || text
            || '</p></div><script>var x = 1 < 2 && "</p>" != null;'
            || '</script><p>&amp;lt; &lt;tail&gt; &nbsp;&quot;end&quot; '
            || 'it&#39;s</p></body></html>' AS html
          FROM documents),
        stripped AS (
          SELECT doc_id,
            trim(regexp_replace(
              replace(replace(replace(replace(replace(replace(replace(
                regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(html,
                    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g'),
                  '(?i)</?[a-z][^>]*>', ' ', 'g'),
                '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                '&quot;', '"'), '&#34;', '"'), '&#39;', ''''),
                '&amp;', '&'),
              '[ \t\r\n]+', ' ', 'g')) AS clean_text
          FROM wrapped)
        SELECT doc_id, clean_text,
               CAST(length(clean_text) AS BIGINT) AS clean_len
        FROM stripped ORDER BY doc_id""")),

    // ---- q87: deterministic TRAIN/VAL/TEST split — the reproducible
    // 80/10/10 assignment every training corpus needs. The split key is
    // a PORTABLE hash (Knuth multiplicative: id·2654435761 mod 2³²,
    // pure BIGINT arithmetic — identical in any engine, unlike
    // engine-native hash functions), so the same doc lands in the same
    // split everywhere, forever. Per-(split, lang) inventory: pure
    // per-row compute + one small aggregate, no join. ----
    Q("q87_docs_train_split",
      (s, dir) => {
        val bucket = (col("doc_id") * lit(2654435761L)) % 4294967296L % 100
        val split = when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test")
        fan(t(s, dir, "documents"))
          .select(split.as("split"), col("lang"), col("n_chars"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("split", "lang")
      },
      Some("""
        WITH d AS (
          SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
                      THEN 'train'
                      WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                      THEN 'val' ELSE 'test' END AS split,
                 lang, n_chars
          FROM documents)
        SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM d GROUP BY split, lang
        ORDER BY split, lang""")),

    // ---- q89: warehouse POINT LOOKUP through the bloom file index —
    // the skip rung after partition pruning (partition cols) and
    // footer min/max (clustered numerics): equality on a
    // high-cardinality STRING key, where ranges can't prune at all.
    // Four interleaved appends give every file the full doc_id spread;
    // each readPoint probes per-file bloom sidecars and plans only the
    // owning file (WarehouseBloomSpec pins the skip counts; skipping
    // is result-invisible by construction, which is exactly what this
    // gate proves end-to-end — incl. an absent key yielding zero
    // rows). ----
    Q("q89_warehouse_point_lookup",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q89-")
          .toString
        val schema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("key", StringType),
          StructField("lang", StringType),
          StructField("n_chars", LongType)))
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("docs" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("doc_id"), bloomColumns = Seq("key"),
            bloomExpectedItems = 100000L, bloomFpp = 0.01)))
        wh.bootstrap()
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("doc-"), col("doc_id")).as("key"),
          col("lang"), col("n_chars"))
        (0 until 4).foreach(i =>
          wh.append("docs", docs.where(col("doc_id") % 4 === i).coalesce(1)))
        Seq("doc-4", "doc-17", "doc-33", "doc-999999999")
          .map(k => wh.readPoint("docs", "key", k).where(col("key") === k))
          .reduce(_ unionByName _)
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, 'doc-' || doc_id AS key, lang, n_chars
        FROM documents
        WHERE doc_id IN (4, 17, 33)
        ORDER BY doc_id""")),

    // ---- q91: multinomial NAIVE BAYES (TextClassifier.naiveBayes) —
    // the curation ladder's trainable classifier rung kept ORACLE-EXACT:
    // closed-form counting fit (priors + add-one-smoothed likelihoods)
    // means the entire fit+predict replays as relational algebra, which
    // no iterative classifier allows. Emits the label confusion matrix
    // (fit and scored on the same corpus — the determinism statement,
    // not a generalization claim). Log-posteriors round to 6 dp before
    // the per-doc argmax; ties break on label order. ----
    Q("q91_docs_naive_bayes",
      (s, dir) => {
        graft.ext.TextClassifier.naiveBayes(fan(t(s, dir, "documents")),
            "doc_id", "text", "lang")
          .groupBy(col("label").as("true_lang"),
            col("predicted").as("pred_lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .orderBy("true_lang", "pred_lang")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        toks AS (SELECT doc_id, lang, unnest(tk) AS term FROM d),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM documents),
        pri AS (SELECT lang,
                       ln(count(*) / (SELECT n_total FROM nt)) AS ln_prior
                FROM documents GROUP BY lang),
        tc AS (SELECT term, lang, count(*) AS n_tc FROM toks GROUP BY 1, 2),
        ct AS (SELECT lang, sum(n_tc) AS n_c FROM tc GROUP BY lang),
        vocab AS (SELECT DISTINCT term FROM tc),
        vs AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
        grid AS (
          SELECT vocab.term, ct.lang AS c,
                 ln((coalesce(tc.n_tc, 0) + 1.0)
                    / (ct.n_c + (SELECT v FROM vs))) AS ln_p
          FROM vocab CROSS JOIN ct
          LEFT JOIN tc ON tc.term = vocab.term AND tc.lang = ct.lang),
        scored AS (
          SELECT t.doc_id, t.lang AS true_lang, g.c,
                 round(p.ln_prior + sum(g.ln_p), 6) AS score
          FROM toks t
          JOIN grid g ON g.term = t.term
          JOIN pri p ON p.lang = g.c
          GROUP BY t.doc_id, t.lang, g.c, p.ln_prior),
        best AS (
          SELECT doc_id, true_lang, c AS pred_lang,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, c) AS rn
          FROM scored)
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM best WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // ---- q92: k-NN CLASSIFICATION over embeddings — majority label of
    // the 7 nearest neighbors (exact cosine, q33's broadcast-query
    // shape: the corpus streams once, nothing all-pairs). Votes break
    // ties on (count desc, label asc) and neighbor ranking uses the
    // repo's rounded-cosine + id tiebreak, so the prediction is
    // engine-deterministic end to end. ----
    Q("q92_embed_knn_classify",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("true_label"))
        val nn = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries.select("qid", "qvec"), "qid", "qvec", k = 7)
        val votes = nn
          .join(emb.select(col("vec_id").as("id"),
            col("label").as("nn_label")), "id")
          .groupBy("qid", "nn_label")
          .agg(count(lit(1)).as("n_votes"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid")
          .orderBy(col("n_votes").desc, col("nn_label").asc)
        votes.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1)
          .join(broadcast(queries.select("qid", "true_label")), "qid")
          .select(col("qid"), col("true_label"),
            col("nn_label").as("pred_label"),
            col("n_votes").cast("long").as("n_votes"))
          .orderBy("qid")
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label
          FROM embeddings WHERE vec_id % 50 = 0),
        scored AS (
          SELECT q.qid, e.vec_id AS id, e.label AS nn_label,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        nn AS (
          SELECT qid, id, nn_label,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored),
        votes AS (
          SELECT qid, nn_label, count(*) AS n_votes
          FROM nn WHERE rank <= 7
          GROUP BY qid, nn_label),
        best AS (
          SELECT qid, nn_label, n_votes,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY n_votes DESC, nn_label) AS rn
          FROM votes)
        SELECT b.qid, q.label AS true_label, b.nn_label AS pred_label,
               CAST(b.n_votes AS BIGINT) AS n_votes
        FROM best b JOIN q ON q.qid = b.qid
        WHERE b.rn = 1
        ORDER BY b.qid""")),

    // ---- q95: edit-distance-1 typo pairs via the SymSpell deletion
    // neighborhood (NearDup.editDistancePairs) — the short-key rung of
    // the dedup ladder. Keys are 'doc-<id>' plus planted typos (every
    // 25th key's last char replaced); the deletion-variant equi-join is
    // a PROVABLY lossless candidate generator for distance ≤ 1, each
    // surviving pair pays one exact Levenshtein. The oracle
    // brute-forces all pairs with DuckDB's levenshtein — candidate
    // generation itself is under the hash compare (a missed pair fails
    // the row count). ----
    Q("q95_docs_typo_pairs",
      (s, dir) => {
        val keys = fan(t(s, dir, "documents"))
          .select(col("doc_id"), concat(lit("doc-"), col("doc_id")).as("key"))
        val typos = keys.where(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(expr("substring(key, 1, length(key) - 1)"), lit("x"))
              .as("key"))
        graft.ext.NearDup.editDistancePairs(
            keys.unionByName(typos), "doc_id", "key")
          .select(col("id1"), col("id2"), col("key1"), col("key2"),
            col("dist").cast("long").as("dist"))
          .orderBy("id1", "id2")
      },
      Some("""
        WITH u AS (
          SELECT doc_id, 'doc-' || doc_id AS key FROM documents
          UNION ALL
          SELECT doc_id + 1000000,
                 substring('doc-' || doc_id, 1,
                           length('doc-' || doc_id) - 1) || 'x'
          FROM documents WHERE doc_id % 25 = 0)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               a.key AS key1, b.key AS key2,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM u a JOIN u b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= 1
        ORDER BY id1, id2""")),

    // ---- q97: embedding OUTLIER detection — the mislabeled-data check
    // of the curation ladder: per-label centroids, then each vector's
    // cosine to its OWN centroid, worst 3 per label. Entirely in the
    // exploded (vec, position) relational domain — centroid build is
    // one (label, pos) aggregate, distances re-join on (label, pos) and
    // fold per vector, so no array arithmetic and no UDF anywhere; cost
    // scales with rows × dim, never pairs. Cosines round to 6 dp before
    // the rank (engine-stable), ties break on vec_id. ----
    Q("q97_embed_label_outliers",
      (s, dir) => {
        val expl = fan(t(s, dir, "embeddings"))
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("pos", "xf")))
          .select(col("vec_id"), col("label"), col("pos"),
            col("xf").cast("double").as("x"))
        val cent = expl.groupBy("label", "pos").agg(avg(col("x")).as("c"))
        val per = expl.join(cent, Seq("label", "pos"))
          .groupBy("vec_id", "label")
          .agg(sum(col("x") * col("c")).as("dot"),
            sum(col("x") * col("x")).as("nv"),
            sum(col("c") * col("c")).as("nc"))
          .select(col("vec_id"), col("label"),
            round(col("dot") / (sqrt(col("nv")) * sqrt(col("nc"))), 6)
              .as("cos_to_centroid"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("label")
          .orderBy(col("cos_to_centroid").asc, col("vec_id").asc)
        per.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select(col("label"), col("rnk").cast("long").as("rnk"),
            col("vec_id"), col("cos_to_centroid"))
          .orderBy("label", "rnk")
      },
      Some("""
        WITH expl AS (
          SELECT vec_id, label, i AS pos,
                 CAST(embedding[i + 1] AS DOUBLE) AS x
          FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
        cent AS (
          SELECT label, pos, avg(x) AS c
          FROM expl GROUP BY label, pos),
        per AS (
          SELECT e.vec_id, e.label,
                 round(sum(e.x * c.c)
                       / (sqrt(sum(e.x * e.x)) * sqrt(sum(c.c * c.c))), 6)
                   AS cos_to_centroid
          FROM expl e JOIN cent c ON c.label = e.label AND c.pos = e.pos
          GROUP BY e.vec_id, e.label),
        ranked AS (
          SELECT label, vec_id, cos_to_centroid,
                 row_number() OVER (PARTITION BY label
                   ORDER BY cos_to_centroid, vec_id) AS rnk
          FROM per)
        SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, cos_to_centroid
        FROM ranked WHERE rnk <= 3
        ORDER BY label, rnk""")),

    // ---- q104: PRODUCT QUANTIZATION with asymmetric scoring
    // (ext.PQ) — the compression rung after int8 (q57): 64 dims → 4
    // codes against a FIXED closed-form codebook (4 subspaces × 4
    // centroids × 16 dims), so encoding is a pure per-row argmin the
    // oracle replays arithmetic-exactly: DuckDB computes the same
    // per-subspace squared distances from the same decimal literals,
    // picks codes by the same (distance, code) order, and re-ranks the
    // ADC sums rounded to 6 dp. The operator's k-means fit path is
    // spec-covered (ExtSpec PQ recall); the gate pins the plan-literal
    // encode + ADC machinery itself. ----
    Q("q104_embed_pq_adc",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        graft.ext.PQ.topK(emb, "vec_id", "embedding",
            queries, "qid", "qvec", k = 10, LlmQueries.pqFixedCodebook)
          .select(col("qid"), col("id"), col("adist"),
            col("rank").cast("int").as("rank"))
          .orderBy("qid", "rank")
      },
      Some {
        val cbRows = LlmQueries.pqFixedCodebook.zipWithIndex.flatMap {
          case (ks, m) => ks.zipWithIndex.map { case (cent, k) =>
            s"($m, $k, [${cent.mkString(", ")}])"
          }
        }.mkString(",\n          ")
        s"""
        WITH cb(sub, code, cent) AS (VALUES
          $cbRows),
        ms AS (SELECT unnest(range(4)) AS m),
        sub AS (
          SELECT e.vec_id, ms.m,
                 list_slice(e.embedding, ms.m * 16 + 1, ms.m * 16 + 16) AS sv
          FROM embeddings e CROSS JOIN ms),
        dists AS (
          SELECT s.vec_id, s.m, cb.code,
                 list_sum(list_transform(range(16), j ->
                   (CAST(sv[j + 1] AS DOUBLE) - cent[j + 1])
                     * (CAST(sv[j + 1] AS DOUBLE) - cent[j + 1]))) AS d
          FROM sub s JOIN cb ON cb.sub = s.m),
        codes AS (
          SELECT vec_id, m, code FROM (
            SELECT vec_id, m, code,
                   row_number() OVER (PARTITION BY vec_id, m
                     ORDER BY d, code) AS rn
            FROM dists) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qvec
              FROM embeddings WHERE vec_id < 5),
        qsub AS (
          SELECT q.qid, ms.m,
                 list_slice(q.qvec, ms.m * 16 + 1, ms.m * 16 + 16) AS sv
          FROM q CROSS JOIN ms),
        qtab AS (
          SELECT s.qid, s.m, cb.code,
                 list_sum(list_transform(range(16), j ->
                   (CAST(sv[j + 1] AS DOUBLE) - cent[j + 1])
                     * (CAST(sv[j + 1] AS DOUBLE) - cent[j + 1]))) AS d
          FROM qsub s JOIN cb ON cb.sub = s.m),
        scored AS (
          SELECT qt.qid, c.vec_id AS id, round(sum(qt.d), 6) AS adist
          FROM codes c JOIN qtab qt ON qt.m = c.m AND qt.code = c.code
          WHERE c.vec_id <> qt.qid
          GROUP BY 1, 2),
        ranked AS (
          SELECT qid, id, adist,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY adist, id) AS INT) AS rank
          FROM scored)
        SELECT qid, id, adist, rank FROM ranked WHERE rank <= 10
        ORDER BY qid, rank"""
      }),

    // ---- q105: DSIR importance resampling (ext.Dsir) — pick the 50
    // raw-pool docs that best match a target corpus (the zh subset) by
    // hashed-ngram log-likelihood ratio, drawn with deterministic
    // Gumbel top-k. Feature hashing is an md5 fold (replayable — never
    // murmur3), Gumbel noise is a pure function of (doc_id, salt), and
    // both the weight and the sample key round to 6 dp BEFORE the cut,
    // so the oracle re-derives the exact sample: model fits (two
    // bucket-bounded count aggregates), per-doc weight folds, noise,
    // ranking — all under the hash gate. ----
    Q("q105_docs_dsir_resample",
      (s, dir) => {
        val raw = fan(t(s, dir, "documents"))
        graft.ext.Dsir.resample(raw, raw.where(col("lang") === "zh"),
            "doc_id", "text", k = 50, buckets = 256, salt = "dsir")
          .orderBy(col("sample_key").desc, col("doc_id"))
      },
      Some {
        // hex-fold helpers: value of the first `w` md5 hex chars of `e`
        def hexFold(e: String, w: Int) =
          s"""CAST(list_sum(list_transform(range(1, ${w + 1}), i ->
             (strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1)
             * CAST(power(16, $w - i) AS BIGINT))) AS BIGINT)"""
        s"""
        WITH tk AS (
          SELECT doc_id, lang,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\\s+')
                 END AS tk
          FROM documents),
        feats AS (
          SELECT doc_id, lang,
                 tk || list_transform(range(1, len(tk)),
                                      i -> tk[i] || ' ' || tk[i+1]) AS fs
          FROM tk),
        inst AS (
          SELECT doc_id, lang, ${hexFold("f", 4)} % 256 AS bucket
          FROM feats, UNNEST(fs) AS t(f)),
        pc AS (SELECT bucket, count(*) AS c FROM inst
               WHERE lang = 'zh' GROUP BY bucket),
        qc AS (SELECT bucket, count(*) AS c FROM inst GROUP BY bucket),
        pt AS (SELECT sum(c) * 1.0 AS n FROM pc),
        qt AS (SELECT sum(c) * 1.0 AS n FROM qc),
        db AS (SELECT doc_id, bucket, count(*) AS n
               FROM inst GROUP BY doc_id, bucket),
        w AS (
          SELECT db.doc_id, CAST(sum(db.n) AS BIGINT) AS n_features,
                 sum(db.n * (
                   coalesce(ln((pc.c + 1) / (pt.n + 256)),
                            ln(1.0 / (pt.n + 256)))
                   - coalesce(ln((qc.c + 1) / (qt.n + 256)),
                              ln(1.0 / (qt.n + 256))))) AS lw
          FROM db LEFT JOIN pc USING (bucket) LEFT JOIN qc USING (bucket)
          CROSS JOIN pt CROSS JOIN qt
          GROUP BY db.doc_id),
        allw AS (
          SELECT d.doc_id, coalesce(w.n_features, 0) AS n_features,
                 coalesce(w.lw, 0.0) AS lw
          FROM documents d LEFT JOIN w USING (doc_id)),
        keyed AS (
          SELECT doc_id, n_features, round(lw, 6) AS log_weight,
                 round(lw + (-ln(-ln(
                   (CAST(${hexFold("doc_id || ':dsir'", 8)} AS DOUBLE) + 0.5)
                   / 4294967296.0))), 6) AS sample_key
          FROM allw)
        SELECT doc_id, n_features, log_weight, sample_key
        FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50"""
      }),

    // ---- q106: C4-style duplicate-span SCRUB
    // (NearDup.scrubRepeatedSpans) — the removal half of q71's
    // detection: every non-first occurrence of a repeated 8-token span
    // loses its covered tokens, and docs re-assemble from the
    // survivors. On the near-dup fixture the mutants (original text +
    // ' zq zq') scrub down to just their unique tail while every
    // original survives intact — and the oracle replays occurrence
    // ranking, position coverage, anti-join, and ordered reassembly
    // relationally, so the whole transform sits under the hash gate
    // (pure string/int arithmetic — no floats anywhere). ----
    Q("q106_docs_scrub_spans",
      (s, dir) => {
        val docs = withNearDups(fan(t(s, dir, "documents")))
        graft.ext.NearDup.scrubRepeatedSpans(docs, "doc_id", "text", n = 8)
          .orderBy("doc_id")
      },
      Some {
        val spanConcat = (0 until 8).map(o => s"tk[i+$o]")
          .mkString(" || ' ' || ")
        s"""
        WITH u AS ($nearDupUnionSql),
        tk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\\s+')
                 END AS tk
          FROM u),
        occ AS (
          SELECT doc_id, i, $spanConcat AS sh
          FROM tk, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS t(i)),
        marked AS (
          SELECT doc_id, i,
                 row_number() OVER (PARTITION BY sh
                                    ORDER BY doc_id, i) AS rn
          FROM occ),
        rem AS (
          SELECT DISTINCT doc_id, p
          FROM marked, UNNEST(range(i, i + 8)) AS t(p)
          WHERE rn >= 2),
        toks AS (
          SELECT doc_id, p, tk[p] AS tok
          FROM tk, UNNEST(range(1, len(tk) + 1)) AS t(p)),
        kept AS (
          SELECT t.doc_id, t.p, t.tok
          FROM toks t LEFT JOIN rem r
            ON r.doc_id = t.doc_id AND r.p = t.p
          WHERE r.doc_id IS NULL),
        agg AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(tok, ' ' ORDER BY p) AS text_clean
          FROM kept GROUP BY doc_id)
        SELECT tk.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
               coalesce(agg.text_clean, '') AS text_clean
        FROM tk LEFT JOIN agg USING (doc_id)
        ORDER BY tk.doc_id"""
      }),

    // ---- q109: the Gopher quality-rule ladder (QualityRules) — five
    // named pass/fail predicates per doc (word-count bounds, mean word
    // length, symbol ratio, alphabetic-token ratio, stopword presence),
    // a conjunctive keep verdict, and FIRST-failing-rule attribution —
    // the per-rule tuning signal a blended score (q35) can't give. All
    // pure codegen'd row expressions on the scan; the oracle replays
    // every predicate and the attribution order. ----
    Q("q109_docs_gopher_rules",
      (s, dir) => {
        import graft.ext.QualityRules
        val docs = fan(t(s, dir, "documents"))
        QualityRules.evaluate(docs, "text",
            QualityRules.gopher(col("text")))
          .select(col("doc_id"), col("word_count"),
            col("mean_word_length"), col("symbol_to_word_ratio"),
            col("alpha_word_ratio"), col("stopword_hits"),
            col("keep"), col("first_fail"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        m AS (
          SELECT doc_id,
                 len(tk) AS n,
                 CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                   / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS mean_len,
                 ((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) / 3)
                   / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS sym_ratio,
                 CAST(len(list_filter(tk,
                        t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                   / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS alpha_ratio,
                 len(list_filter(tk, t -> t IN
                   ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS stops
          FROM tk),
        flags AS (
          SELECT doc_id,
                 (n >= 50 AND n <= 100000) AS word_count,
                 (mean_len >= 3.0 AND mean_len <= 10.0) AS mean_word_length,
                 (sym_ratio <= 0.1) AS symbol_to_word_ratio,
                 (alpha_ratio >= 0.8) AS alpha_word_ratio,
                 (stops >= 2) AS stopword_hits
          FROM m)
        SELECT doc_id, word_count, mean_word_length, symbol_to_word_ratio,
               alpha_word_ratio, stopword_hits,
               (word_count AND mean_word_length AND symbol_to_word_ratio
                AND alpha_word_ratio AND stopword_hits) AS keep,
               CASE WHEN NOT word_count THEN 'word_count'
                    WHEN NOT mean_word_length THEN 'mean_word_length'
                    WHEN NOT symbol_to_word_ratio THEN 'symbol_to_word_ratio'
                    WHEN NOT alpha_word_ratio THEN 'alpha_word_ratio'
                    WHEN NOT stopword_hits THEN 'stopword_hits'
                    ELSE NULL END AS first_fail
        FROM flags
        ORDER BY doc_id""")),

    // ---- q121: HYBRID retrieval — BM25 lexical candidates ∪ dense
    // cosine candidates, fused by reciprocal rank (RRF). Two query
    // ids, each with a term bag (lexical side) and the id's own
    // embedding (dense side, doc_id ≡ vec_id); each retriever emits
    // its top-50, fusion scores 1/(60+rank) summed across lists, top-10
    // per query survives. Rank-space fusion is exactly replayable: the
    // oracle re-derives BM25 (the q84 formula), cosine (the q33
    // formula), both rank cuts, and the reciprocal-rank arithmetic. ----
    Q("q121_docs_hybrid_rrf",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val emb = fan(t(s, dir, "embeddings"))
        val lex = Seq(
            3L -> Seq("join", "vector", "stream"),
            11L -> Seq("customer", "order", "spark"))
          .map { case (qid, terms) =>
            graft.ext.Retrieval.bm25TopK(docs, "doc_id", "text", terms, 50)
              .select(lit(qid).as("qid"), lit("lex").as("src"),
                col("id"), col("score"))
          }.reduce(_ unionByName _)
        val qvecs = emb.where(col("vec_id").isin(3L, 11L))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val dense = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            qvecs, "q_id", "q_vec", k = 50)
          .select(col("qid"), lit("dense").as("src"), col("id"),
            col("cosine").as("score"))
        graft.ext.Retrieval.rrfFuse(lex.unionByName(dense),
            "qid", "src", "id", "score", k = 10)
          .select(col("qid"), col("id"), col("n_lists"), col("rrf"),
            col("rank"))
          .orderBy("qid", "rank")
      },
      Some("""
        WITH dtk AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\s+')
                 END AS tk
          FROM documents),
        dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, tk FROM dtk),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                         avg(dl) AS avgdl FROM dl),
        q(qid, term) AS (VALUES
          (3, 'join'), (3, 'vector'), (3, 'stream'),
          (11, 'customer'), (11, 'order'), (11, 'spark')),
        tf AS (
          SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl)
          WHERE term IN (SELECT term FROM q)
          GROUP BY doc_id, dl, term),
        dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                  FROM tf GROUP BY term),
        bm25 AS (
          SELECT q.qid, tf.doc_id AS id,
                 round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                           * tf * 2.2
                           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                       6) AS score
          FROM tf JOIN dfreq USING (term) JOIN q USING (term)
          CROSS JOIN stats
          GROUP BY q.qid, tf.doc_id),
        lex AS (
          SELECT qid, id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, id) AS r
          FROM bm25 QUALIFY r <= 50),
        qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
               FROM embeddings WHERE vec_id IN (3, 11)),
        cos AS (
          SELECT qv.qid, e.vec_id AS id,
                 round(list_dot_product(e.embedding::DOUBLE[], qv.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(qv.qvec, qv.qvec))), 6)
                   AS score
          FROM embeddings e, qv WHERE e.vec_id <> qv.qid),
        dense AS (
          SELECT qid, id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, id) AS r
          FROM cos QUALIFY r <= 50),
        u AS (SELECT qid, id, r FROM lex
              UNION ALL SELECT qid, id, r FROM dense),
        fused AS (
          SELECT qid, id, CAST(count(*) AS BIGINT) AS n_lists,
                 round(sum(1.0 / (60 + r)), 9) AS rrf
          FROM u GROUP BY qid, id)
        SELECT CAST(qid AS BIGINT) AS qid, id, n_lists, rrf,
               CAST(row_number() OVER (PARTITION BY qid
                                       ORDER BY rrf DESC, id) AS BIGINT)
                 AS rank
        FROM fused
        QUALIFY rank <= 10
        ORDER BY qid, rank""")),

    // ---- q125: HARD-NEGATIVE mining — the contrastive-training
    // curation step (DPR/ANCE): per query vector, the nearest corpus
    // vectors whose LABEL differs. Two deterministic rank cuts (kCand
    // nearest by cosine, then kNeg best cross-label within them), both
    // replayed by the oracle with the q33 cosine arithmetic plus the
    // label joins. A same-label neighbor leaking through, a candidate
    // outside the top-20 pool, or a rank off by one all break the
    // hash. ----
    Q("q125_embed_hard_negatives",
      (s, dir) => {
        val emb = fan(t(s, dir, "embeddings"))
        val queries = emb.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_lab"))
        Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
            queries, "q_id", "q_vec", "q_lab", kCand = 20, kNeg = 5)
          .orderBy("qid", "neg_rank")
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qlab
          FROM embeddings WHERE vec_id % 100 = 0),
        scored AS (
          SELECT q.qid, e.vec_id AS id, e.label AS neg_label,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(q.qvec, q.qvec))), 6)
                   AS cosine,
                 q.qlab
          FROM embeddings e, q WHERE e.vec_id <> q.qid),
        cands AS (
          SELECT qid, id, neg_label, cosine, qlab,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS crank
          FROM scored QUALIFY crank <= 20),
        negs AS (
          SELECT qid, id, neg_label, cosine,
                 CAST(row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, id)
                      AS BIGINT) AS neg_rank
          FROM cands WHERE neg_label <> qlab)
        SELECT qid, id, neg_label, cosine, neg_rank
        FROM negs
        WHERE neg_rank <= 5
        ORDER BY qid, neg_rank""")),

    // ---- q122: CANONICAL SELECTION — near-dedup that keeps the
    // highest-QUALITY member of each duplicate cluster (argmax
    // qualityScore, ties to the smallest id), not the first-seen. The
    // chain corpus (orig → mutant → mutant²) makes the choice
    // non-trivial: appended junk tokens change the quality score, so
    // the kept member is a real decision the oracle must replay —
    // recursive transitive closure for the clusters + the q35 quality
    // formula + a per-cluster argmax. ----
    Q("q122_docs_cluster_canonical",
      (s, dir) => {
        val docs = withNearDupChains(fan(t(s, dir, "documents")))
          .select("doc_id", "text")
        val pairs = NearDup.jaccardPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.6)
        NearDup.keepBest(docs, "doc_id", pairs,
            TextFunctions.qualityScore(col("text")))
          .where(col("is_kept"))
          .select(col("doc_id"), col("cluster_id"),
            col("cluster_size"),
            TextFunctions.qualityScore(col("text")).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE
        u AS ($nearDupChainSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id1, id2
          FROM inter
          JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2
          WHERE CAST(n_common AS DOUBLE) /
                CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 0.6),
        edges AS (
          SELECT id1 AS s, id2 AS d FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM u
          UNION
          SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id
          FROM reach GROUP BY src),
        scored AS (
          SELECT u.doc_id, comp.cluster_id,
            round(0.4 * least(CAST(length(trim(text)) AS DOUBLE) / 500.0, 1.0)
                + 0.4 * CAST(length(regexp_replace(lower(trim(text)),
                                                   '[^a-z]', '', 'g')) AS DOUBLE)
                      / greatest(CAST(length(trim(text)) AS DOUBLE), 1.0)
                + 0.2 * (CASE WHEN CAST(length(trim(text)) AS DOUBLE)
                              / greatest(CAST(len(CASE
                                  WHEN trim(text) = ''
                                  THEN CAST([] AS VARCHAR[])
                                  ELSE string_split_regex(lower(trim(text)),
                                                          '\\s+')
                                END) AS DOUBLE), 1.0)
                              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
                  6) AS quality
          FROM u JOIN comp USING (doc_id))
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size,
               quality
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY quality DESC, doc_id) = 1
        ORDER BY doc_id""")),

    // ---- q123: per-SOURCE volume caps — domain balancing: each source
    // keeps at most 15 docs, chosen by the deterministic md5 hash
    // priority (not arrival order), so the kept set replays exactly in
    // any engine. The curation counterpart to q55's rate sampling: an
    // absolute per-origin bound instead of a fraction. ----
    Q("q123_docs_source_caps",
      (s, dir) => {
        Sampling.capPerKey(fan(t(s, dir, "documents")),
            "doc_id", "source", cap = 15, salt = "caps")
          .select(col("doc_id"), col("source"), col("key_rank"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, source, CAST(rn AS BIGINT) AS key_rank
        FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':caps'),
                            1, 8), doc_id) AS rn
          FROM documents)
        WHERE rn <= 15
        ORDER BY doc_id""")),

    // ---- q126: BPE SEGMENTATION under a FIXED merge table — the
    // deployment half of the tokenizer (training runs under spec
    // equality with a sequential reference trainer; segmentation is
    // pure and replayable, so it goes under the hash gate). Every
    // word splits to characters (last carrying Sennrich's </w>
    // marker), then the 10 literal merges apply in rank order, each
    // as one greedy left-to-right scan-and-splice pass. The whole
    // query is ONE per-row expression chain: tokens → per-word
    // fold of applyMerge — no explode, no shuffle, no UDF. The
    // oracle replays the greedy pass as chained REPLACEs over a
    // brace-delimited symbol string ('{' and '}' cannot occur in the
    // corpus alphabet or the marker): REPLACE's non-overlapping
    // left-to-right sweep IS the greedy splice, and the full
    // delimiters make a symbol-boundary-crossing match impossible. ----
    Q("q126_docs_bpe_segment",
      (s, dir) => {
        val docs = fan(t(s, dir, "documents"))
        val toks = TextFunctions.tokens(col("text"))
        val segs = transform(col("tk"),
          w => Vocab.bpeSegment(w, bpeFixedMerges))
        docs.select(col("doc_id"), toks.as("tk"))
          .withColumn("flat", flatten(segs))
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_words"),
            size(col("flat")).cast("long").as("n_bpe"),
            concat_ws(" ", col("flat")).as("seg"))
          .orderBy("doc_id")
      },
      Some {
        val chain = bpeFixedMerges.foldLeft(
          """array_to_string(list_transform(range(1, len(w) + 1), i ->
               '{' || substr(w, i, 1) ||
               CASE WHEN i = len(w) THEN '</w>' ELSE '' END || '}'), '')""") {
          case (acc, (l, r)) => s"REPLACE($acc, '{$l}{$r}', '{$l$r}')"
        }
        s"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(lower(trim(text)), '\\s+')
                 END AS tk
          FROM documents),
        seg AS (
          SELECT doc_id, tk,
                 flatten(list_transform(tk, w ->
                   string_split(substr($chain, 2,
                     len($chain) - 2), '}{'))) AS flat
          FROM t)
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_words,
               CAST(len(flat) AS BIGINT) AS n_bpe,
               array_to_string(flat, ' ') AS seg
        FROM seg ORDER BY doc_id"""
      }),

    // ---- q127: the PERSISTED MinHash index — build on the first
    // corpus batch, INCREMENTALLY refresh after the second lands
    // (only the manifest-diff rows get signed; the watermark rides
    // the index commit), then probe near-dup pairs from the stored
    // signatures. Cross-batch duplicate pairs prove the increment
    // composes with the original build: batch-2 copies of batch-1
    // docs are found without ever re-signing batch 1. At
    // minJaccard = 1.0 recall is structural (identical shingle sets
    // ⇒ identical signatures ⇒ same band keys), so the DuckDB oracle
    // brute-forces equal-shingle-set pairs over the same corpus —
    // the q32 criterion, now against index tables instead of a
    // per-run signing pass. ----
    Q("q127_docs_persisted_index",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q127-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("docs" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("doc_id", LongType),
              StructField("text", StringType))))))
        wh.bootstrap()
        val corpus = withExactDups(fan(t(s, dir, "documents")))
          .select(col("doc_id"), col("text"))
        wh.append("docs", corpus.where(col("doc_id") % 3 =!= 0))
        graft.pipeline.IndexStore.refreshMinhash(wh, "docs", "idx",
          "doc_id", "text", n = 3, numHashes = 64, nParts = 8)
        wh.append("docs", corpus.where(col("doc_id") % 3 === 0))
        graft.pipeline.IndexStore.refreshMinhash(wh, "docs", "idx",
          "doc_id", "text", n = 3, numHashes = 64, nParts = 8)
        graft.pipeline.IndexStore.minhashProbePairs(wh, "docs", "idx",
            "doc_id", "text", n = 3, numHashes = 64, numBands = 16,
            minJaccard = 1.0)
          .select(col("id1"), col("id2"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      Some(s"""
        WITH u AS ($dupUnionSql),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM u),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id1, id2,
               round(CAST(n_common AS DOUBLE) /
                     CAST(s1.sz + s2.sz - n_common AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE CAST(n_common AS DOUBLE) /
              CAST(s1.sz + s2.sz - n_common AS DOUBLE) >= 1.0
        ORDER BY id1, id2""")),

    // ---- q128: the DEDUP LADDER end-to-end — the chain a real corpus
    // runs as ONE pipeline, each rung over the previous rung's
    // survivors, with the MinHash rung probing PERSISTED signatures
    // (built incrementally over two appends, the q127 state handoff):
    //   rung 1  byte-exact      min-id per raw text (md5 shuffle key)
    //   rung 2  shingle-exact   persisted-index LSH probe at j = 1.0 —
    //           catches normalization variants (whitespace doubling)
    //           byte-equality misses; recall is STRUCTURAL at 1.0
    //           (equal shingle sets ⇒ equal signatures ⇒ same bands)
    //   rung 3  near-dup        inverted-index Jaccard ≥ 0.6 pairs →
    //           transitive clusters → quality-argmax canonical
    // Output: EVERY corpus doc with its fate ('exact'/'shingle'/
    // 'near'/'kept') and the id it resolved to at its killing rung —
    // the full curation audit trail, deterministic in both engines.
    // Scale: one md5 shuffle + the q127 index probe + the q31/q54
    // bucketed machinery — no new shuffle class, no all-pairs scan;
    // each rung shrinks the next rung's input. ----
    Q("q128_docs_dedup_ladder",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val docs = fan(t(s, dir, "documents")).select("doc_id", "text")
        val corpus = docs
          .unionByName(docs.where(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
          .unionByName(docs.where(col("doc_id") % 15 === 0)
            .withColumn("doc_id", col("doc_id") + 2000000L)
            .withColumn("text", expr("replace(text, ' ', '  ')")))
          .unionByName(docs.where(col("doc_id") % 20 === 0)
            .withColumn("doc_id", col("doc_id") + 3000000L)
            .withColumn("text", concat(col("text"), lit(" zq zq"))))
          .unionByName(docs.where(col("doc_id") % 40 === 0)
            .withColumn("doc_id", col("doc_id") + 4000000L)
            .withColumn("text", concat(col("text"), lit(" zq zq zq zq"))))
        // rung 1: byte-exact keep-min-id; the window partitions by
        // md5(text) so the shuffle key is 16 bytes, not the document
        val w1 = Window.partitionBy(md5(col("text")))
        val r1 = corpus.withColumn("exact_ref", min("doc_id").over(w1))
        val exactLosers = r1.where(col("doc_id") =!= col("exact_ref"))
          .select(col("doc_id"), lit("exact").as("fate"),
            col("exact_ref").as("ref_id"))
        // each rung's survivor set feeds MANY consumers (two warehouse
        // appends, the probe's anti-join, the pair join, the cluster
        // loop) — materialize once so the corpus union + window don't
        // replay per consumer
        val s1 = r1.where(col("doc_id") === col("exact_ref"))
          .select("doc_id", "text").localCheckpoint()
        // rung 2: survivors land in a warehouse in two batches; the
        // signature index refreshes incrementally (batch 2 never
        // re-signs batch 1) and the probe reads STORED signatures
        val whDir = graft.util.Scratch.dir("graft-q128-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("docs" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("doc_id", LongType),
              StructField("text", StringType))))))
        wh.bootstrap()
        wh.append("docs", s1.where(col("doc_id") % 3 =!= 0))
        graft.pipeline.IndexStore.refreshMinhash(wh, "docs", "idx",
          "doc_id", "text", n = 3, numHashes = 64, nParts = 8)
        wh.append("docs", s1.where(col("doc_id") % 3 === 0))
        graft.pipeline.IndexStore.refreshMinhash(wh, "docs", "idx",
          "doc_id", "text", n = 3, numHashes = 64, nParts = 8)
        val pairs2 = graft.pipeline.IndexStore.minhashProbePairs(wh,
          "docs", "idx", "doc_id", "text", n = 3, numHashes = 64,
          numBands = 16, minJaccard = 1.0).localCheckpoint()
        // shingle-equality is transitive and banding recall at 1.0 is
        // total, so each equivalence class is a complete pair graph:
        // min(id1) per id2 IS the class minimum
        val shingleLosers = pairs2.groupBy(col("id2").as("doc_id"))
          .agg(min("id1").as("ref_id"))
          .select(col("doc_id"), lit("shingle").as("fate"), col("ref_id"))
        val s2 = s1.join(pairs2.select(col("id2").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").localCheckpoint()
        // rung 3: lossless inverted-index pairs, transitive clusters,
        // per-cluster quality argmax (the q122 canonical rule)
        val pairs3 = NearDup.jaccardPairs(s2, "doc_id", "text",
          n = 3, minJaccard = 0.6)
        val best = NearDup.keepBest(s2, "doc_id", pairs3,
          TextFunctions.qualityScore(col("text")))
        val winners = best.where(col("is_kept"))
          .select(col("cluster_id"), col("doc_id").as("_win"))
        val resolved = best.join(winners, "cluster_id")
          .select(col("doc_id"),
            when(col("is_kept"), lit("kept")).otherwise(lit("near"))
              .as("fate"),
            col("_win").as("ref_id"))
        exactLosers.unionByName(shingleLosers).unionByName(resolved)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE
        u AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 2000000, replace(text, ' ', '  ')
          FROM documents WHERE doc_id % 15 = 0
          UNION ALL
          SELECT doc_id + 3000000, text || ' zq zq'
          FROM documents WHERE doc_id % 20 = 0
          UNION ALL
          SELECT doc_id + 4000000, text || ' zq zq zq zq'
          FROM documents WHERE doc_id % 40 = 0),
        r1 AS (
          SELECT doc_id, text,
                 min(doc_id) OVER (PARTITION BY text) AS exact_ref
          FROM u),
        s1 AS (SELECT doc_id, text FROM r1 WHERE doc_id = exact_ref),
        toks1 AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM s1),
        post1 AS (
          SELECT DISTINCT doc_id, sh FROM toks1,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        skey AS (
          SELECT doc_id,
                 array_to_string(list_sort(list(DISTINCT sh)), chr(1)) AS k
          FROM post1 GROUP BY doc_id),
        r2 AS (
          SELECT s1.doc_id,
                 min(s1.doc_id) OVER (PARTITION BY skey.k) AS sh_ref
          FROM s1 JOIN skey USING (doc_id)),
        s2 AS (
          SELECT s1.doc_id, s1.text
          FROM s1 LEFT JOIN r2 USING (doc_id)
          WHERE r2.sh_ref IS NULL OR r2.sh_ref = s1.doc_id),
        toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
          FROM s2),
        post AS (
          SELECT DISTINCT doc_id, sh FROM toks,
          UNNEST(list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t(sh)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
          FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id1, id2
          FROM inter
          JOIN sizes z1 ON z1.doc_id = id1
          JOIN sizes z2 ON z2.doc_id = id2
          WHERE CAST(n_common AS DOUBLE) /
                CAST(z1.sz + z2.sz - n_common AS DOUBLE) >= 0.6),
        edges AS (
          SELECT id1 AS s, id2 AS d FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM s2
          UNION
          SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s),
        comp AS (
          SELECT src AS doc_id, min(dst) AS cluster_id
          FROM reach GROUP BY src),
        scored AS (
          SELECT s2.doc_id, comp.cluster_id,
            round(0.4 * least(CAST(length(trim(text)) AS DOUBLE) / 500.0, 1.0)
                + 0.4 * CAST(length(regexp_replace(lower(trim(text)),
                                                   '[^a-z]', '', 'g')) AS DOUBLE)
                      / greatest(CAST(length(trim(text)) AS DOUBLE), 1.0)
                + 0.2 * (CASE WHEN CAST(length(trim(text)) AS DOUBLE)
                              / greatest(CAST(len(CASE
                                  WHEN trim(text) = ''
                                  THEN CAST([] AS VARCHAR[])
                                  ELSE string_split_regex(lower(trim(text)),
                                                          '\\s+')
                                END) AS DOUBLE), 1.0)
                              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
                  6) AS quality
          FROM s2 JOIN comp USING (doc_id)),
        win AS (
          SELECT cluster_id, doc_id AS win_id
          FROM scored
          QUALIFY row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY quality DESC, doc_id) = 1)
        SELECT doc_id, fate, ref_id FROM (
          SELECT doc_id, 'exact' AS fate, exact_ref AS ref_id
          FROM r1 WHERE doc_id <> exact_ref
          UNION ALL
          SELECT doc_id, 'shingle', sh_ref FROM r2 WHERE doc_id <> sh_ref
          UNION ALL
          SELECT sc.doc_id,
                 CASE WHEN sc.doc_id = w.win_id THEN 'kept' ELSE 'near' END,
                 w.win_id
          FROM scored sc JOIN win w USING (cluster_id))
        ORDER BY doc_id""")),

    // ---- q129: PERSISTED MATERIALIZED VIEWS under the hash gate — the
    // aggregate sibling of q127's index store. Corpus stats (the frame
    // every curation decision reads: docs/chars/avg/min/max per
    // lang×source) live as warehouse-table STATE, refreshed from the
    // manifest diff, never by rescanning the corpus. Two views over one
    // source exercise both maintenance regimes through the same
    // append → append → UPDATE → DELETE history:
    //   - mv_sums (count/sum/avg): δ-weighted change-feed fold the
    //     whole way — retractions handled exactly, no rebuild ever;
    //   - mv_full (adds min/max): insert-fold through the appends,
    //     automatic full rebuild when the UPDATE's retraction could
    //     have evicted an extremum (the honest IVM fallback).
    // The final frame joins both reads; the oracle recomputes the
    // aggregate directly over the mutated survivor set — any
    // double-count, stale watermark, missed retraction, or stale
    // min/max breaks the hash. n_chars is integral so every sum state
    // (long, and double < 2^53) is order-independent-EXACT; avg is an
    // exact sum over an exact count. ----
    Q("q129_docs_matview",
      (s, dir) => {
        import org.apache.spark.sql.types._
        import graft.pipeline.{MaterializedView => MV}
        val whDir = graft.util.Scratch.dir("graft-q129-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true,
          specs = Map("docs" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("doc_id", LongType),
              StructField("lang", StringType),
              StructField("source", StringType),
              StructField("n_chars", LongType))))))
        wh.bootstrap()
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        val full = MV.ViewDef("docs", "mv_full", Seq("lang", "source"),
          Seq(MV.Count("n_docs"), MV.Sum("n_chars", "sum_chars"),
            MV.Avg("n_chars", "avg_chars"), MV.Min("n_chars", "min_chars"),
            MV.Max("n_chars", "max_chars")), nParts = 8)
        val sums = MV.ViewDef("docs", "mv_sums", Seq("lang", "source"),
          Seq(MV.Count("n_docs_d"), MV.Sum("n_chars", "sum_chars_d"),
            MV.Avg("n_chars", "avg_chars_d")), nParts = 8)
        def refreshBoth(): Unit = {
          MV.refresh(wh, full); MV.refresh(wh, sums); ()
        }
        wh.append("docs", docs.where(col("doc_id") % 3 =!= 0))
        refreshBoth() // full build
        wh.append("docs", docs.where(col("doc_id") % 3 === 0))
        refreshBoth() // pure-insert delta path (min/max via least/greatest)
        wh.update("docs", col("doc_id") % 7 === 0,
          Map("n_chars" -> (col("n_chars") + 1000L)))
        wh.delete("docs", col("doc_id") % 11 === 0)
        refreshBoth() // mv_sums: δ-feed retraction fold; mv_full: rebuild
        MV.read(wh, full).join(MV.read(wh, sums), Seq("lang", "source"))
          .select(col("lang"), col("source"), col("n_docs"),
            col("sum_chars"), round(col("avg_chars"), 2).as("avg_chars"),
            col("min_chars"), col("max_chars"), col("n_docs_d"),
            col("sum_chars_d"),
            round(col("avg_chars_d"), 2).as("avg_chars_d"))
          .orderBy("lang", "source")
      },
      Some("""
        WITH mut AS (
          SELECT lang, source,
                 CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
                      ELSE n_chars END AS n_chars
          FROM documents WHERE doc_id % 11 <> 0)
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               round(avg(n_chars), 2) AS avg_chars,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               CAST(count(*) AS BIGINT) AS n_docs_d,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars_d,
               round(avg(n_chars), 2) AS avg_chars_d
        FROM mut GROUP BY lang, source ORDER BY lang, source""")),

    // ---- q130: DoReMi-SHAPED DOMAIN MIXTURE OPTIMIZATION — solve
    // per-language mixture weights by iterated multiplicative updates
    // against a mixture-weighted excess signal, then materialize the
    // optimized mixture as a deterministic hash sample. The solver
    // input is ONE tiny per-domain aggregate; the solve is
    // O(rounds × domains) driver arithmetic with FIXED domain order and
    // left-to-right folds; membership is the q55 md5-threshold rule
    // under broadcast per-domain cuts — corpus scanned twice, shuffled
    // never. The linear update (1 + η·centered-excess) replaces
    // DoReMi's exp() precisely so the DuckDB oracle can replay the
    // whole solve bit-exactly with ordered list_reduce folds (exp's
    // 1-ulp licence differs across libms; +,×,/ are IEEE-exact
    // everywhere). Any drift anywhere — stats, excess, 4 solver
    // rounds, rate, cut quantization, membership — breaks the hash. ----
    Q("q130_docs_doremi_mixture",
      (s, dir) => {
        import graft.ext.Mixture
        val docs = t(s, dir, "documents")
        val stats = docs.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").cast("double").as("sc"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toSeq
        val ws = Mixture.doremiWeights(stats, eta = 0.25, rounds = 4)
        val target = ws.map(_.n.toDouble).foldLeft(0.0)(_ + _) / 2.0
        val sampled = Mixture
          .mixtureSample(docs, "doc_id", "lang", ws, target, salt = "doremi")
          .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        import s.implicits._
        val doms = ws.map(w => (w.domain, w.n, w.excess, w.weight))
          .toDF("lang", "n_docs", "excess", "weight")
        doms.join(sampled, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"),
            round(col("excess"), 6).as("excess"),
            round(col("weight"), 6).as("weight"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy("lang")
      },
      Some {
        // 4 unrolled solver rounds, each: weighted-mean fold → linear
        // update → normalization fold — ordered list_reduce everywhere
        // so the float result is bit-identical to the Scala solve
        val rounds = (0 until 4).map { r =>
          s"""
        m$r AS (SELECT *, list_reduce(list_transform(range(1, len(exs)+1),
                  i -> w$r[i]*exs[i]), (a,b) -> a+b) AS wm$r FROM w${r}cte),
        r$r AS (SELECT *, list_transform(range(1, len(exs)+1),
                  i -> w$r[i]*(CAST(1.0 AS DOUBLE)
                    + CAST(0.25 AS DOUBLE)*(exs[i]-wm$r))) AS raw$r FROM m$r),
        z$r AS (SELECT *, list_reduce(raw$r, (a,b) -> a+b) AS zz$r FROM r$r),
        w${r + 1}cte AS (SELECT *, list_transform(range(1, len(raw$r)+1),
                  i -> raw$r[i]/zz$r) AS w${r + 1} FROM z$r)"""
        }.mkString(",")
        s"""
        WITH s AS (
          SELECT lang, count(*) AS n, CAST(sum(n_chars) AS DOUBLE) AS sc
          FROM documents GROUP BY lang),
        base AS (
          SELECT list(lang ORDER BY lang) AS langs,
                 list(CAST(n AS DOUBLE) ORDER BY lang) AS ns,
                 list(sc ORDER BY lang) AS scs
          FROM s),
        om AS (SELECT langs, ns, scs,
                 list_reduce(scs, (a,b) -> a+b)
                   / list_reduce(ns, (a,b) -> a+b) AS om
               FROM base),
        ex AS (SELECT langs, ns,
                 list_transform(range(1, len(ns)+1),
                   i -> ((scs[i]/ns[i]) - om)/om) AS exs
               FROM om),
        w0cte AS (SELECT *, list_transform(langs,
                    x -> CAST(1.0 AS DOUBLE)/len(langs)) AS w0 FROM ex),
        $rounds,
        fin AS (SELECT langs, ns, exs, w4,
                  list_reduce(ns, (a,b) -> a+b) AS totn FROM w4cte),
        doms AS (
          SELECT langs[i] AS lang,
                 CAST(ns[i] AS BIGINT) AS n_docs,
                 round(exs[i], 6) AS excess,
                 round(w4[i], 6) AS weight,
                 least(CAST(1.0 AS DOUBLE),
                       (w4[i]*(totn/CAST(2.0 AS DOUBLE)))/ns[i]) AS rate
          FROM fin, UNNEST(range(1, len(langs)+1)) AS u(i)),
        cuts AS (
          SELECT *, CASE WHEN CAST(floor(rate*4294967296.0) AS BIGINT)
                              >= 4294967296 THEN 'g'
                         ELSE lpad(lower(hex(CAST(floor(rate*4294967296.0)
                                AS BIGINT))), 8, '0') END AS cut
          FROM doms),
        samp AS (
          SELECT d.lang, count(*) AS n_sampled
          FROM documents d JOIN cuts c ON d.lang = c.lang
          WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':doremi'), 1, 8)
                < c.cut
          GROUP BY d.lang)
        SELECT c.lang, c.n_docs, c.excess, c.weight,
               CAST(coalesce(s2.n_sampled, 0) AS BIGINT) AS n_sampled
        FROM cuts c LEFT JOIN samp s2 ON c.lang = s2.lang
        ORDER BY c.lang"""
      }),

    // ---- q132: the PERSISTED IVF INDEX under the hash gate — q127's
    // discipline applied to the second index family. Build on the
    // first corpus batch (seeded-sample k-means fit ONCE, centroids
    // persisted as a warehouse table), incrementally refresh after the
    // second batch lands (only the manifest-diff rows are assigned,
    // against the SAME persisted centroids), then top-k from the
    // stored assignments at nProbe == nCells — the probe-all
    // invariant: exact brute force for ANY centroid table, so the
    // DuckDB oracle brute-forces cosine over the full corpus exactly
    // like q41, but here the path under test is centroid round-trip +
    // incremental assignment + the bucketed cell probe join. ----
    Q("q132_embed_persisted_ivf",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q132-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("emb" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("vec_id", LongType),
              StructField("embedding", ArrayType(FloatType)))))))
        wh.bootstrap()
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        wh.append("emb", emb.where(col("vec_id") % 3 =!= 0))
        graft.pipeline.IndexStore.buildIvf(wh, "emb", "ivf",
          "vec_id", "embedding", nCells = 8, nParts = 8)
        wh.append("emb", emb.where(col("vec_id") % 3 === 0))
        graft.pipeline.IndexStore.refreshIvf(wh, "emb", "ivf",
          "vec_id", "embedding", nParts = 8)
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        graft.pipeline.IndexStore.ivfProbeTopK(wh, "ivf", "vec_id",
            queries, "qid", "qvec", k = 5, nProbe = 8)
          .select(col("qid"), col("rank").cast("long").as("rank"),
            col("id"), col("cosine"))
          .orderBy("qid", "rank")
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
          FROM embeddings WHERE vec_id % 50 = 0),
        scored AS (
          SELECT q.qid, e.vec_id AS id,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qvec) /
                       (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
          FROM embeddings e, q
          WHERE e.vec_id <> q.qid),
        ranked AS (
          SELECT qid, id, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored)
        SELECT qid, rank, id, cosine FROM ranked
        WHERE rank <= 5 ORDER BY qid, rank""")),

    // ---- q133: METADATA-ONLY aggregates under the hash gate — the
    // Delta OptimizeMetadataOnlyQuery surface. After two inserts, a
    // copy-on-write DELETE, and an UPDATE, the same count/min/max block
    // is computed twice in one statement: once over the bare table
    // (answered from the HEAD MANIFEST — per-file footer row counts and
    // long-encoded stats, zero data files opened; WarehouseSqlSpec pins
    // the LocalRelation plan) and once under `WHERE id >= 0` (the
    // always-correct scan path). Both rows must hash-match the oracle's
    // single recompute — if manifest metadata ever drifted from the
    // data under DML, the meta row would break the hash. Exercises all
    // three stat decodes: long, date (epoch days), timestamp (micros).
    Q("q133_warehouse_meta_aggregates",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q133-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("oday", DateType),
              // NTZ, matching the parquet source's TIMESTAMP_NTZ
              // encoding — the warehouse round-trip must preserve the
              // naive type (the r8 failure: declaring LTZ here made
              // ts_lo/ts_hi come back TIMESTAMP WITH TIME ZONE where
              // the oracle emits naive TIMESTAMP)
              StructField("ots", TimestampNTZType),
              StructField("val", DoubleType))),
            statColumns = Seq("id", "oday", "ots"))))
        wh.bootstrap()
        wh.registerSql("meta133_")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"),
            col("o_orderdate").cast("date").as("oday"),
            col("o_orderdate").as("ots"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("meta133_src")
        s.sql("INSERT INTO meta133_t SELECT * FROM meta133_src WHERE id % 2 = 0")
        s.sql("INSERT INTO meta133_t SELECT * FROM meta133_src WHERE id % 2 = 1")
        s.sql("DELETE FROM meta133_t WHERE id % 97 = 0")
        s.sql("UPDATE meta133_t SET val = val + 1 WHERE id % 11 = 0")
        s.sql("""
          SELECT 'meta' AS src, m.* FROM (
            SELECT count(*) AS n_rows, min(id) AS id_lo, max(id) AS id_hi,
                   min(oday) AS day_lo, max(oday) AS day_hi,
                   min(ots) AS ts_lo, max(ots) AS ts_hi
            FROM meta133_t) m
          UNION ALL
          SELECT 'scan' AS src, sc.* FROM (
            SELECT count(*) AS n_rows, min(id) AS id_lo, max(id) AS id_hi,
                   min(oday) AS day_lo, max(oday) AS day_hi,
                   min(ots) AS ts_lo, max(ots) AS ts_hi
            FROM meta133_t WHERE id >= 0) sc
          ORDER BY src""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id,
                 CAST(o_orderdate AS DATE) AS oday,
                 o_orderdate AS ots
          FROM orders),
        kept AS (SELECT * FROM base WHERE id % 97 <> 0),
        agg AS (
          SELECT count(*) AS n_rows, min(id) AS id_lo, max(id) AS id_hi,
                 min(oday) AS day_lo, max(oday) AS day_hi,
                 min(ots) AS ts_lo, max(ots) AS ts_hi
          FROM kept)
        SELECT s.src, a.n_rows, a.id_lo, a.id_hi, a.day_lo, a.day_hi,
               a.ts_lo, a.ts_hi
        FROM (SELECT 'meta' AS src UNION ALL SELECT 'scan') s
        CROSS JOIN agg a ORDER BY s.src""")),

    // ---- q134: PARTITION-GROUPED metadata aggregates — q133's
    // discipline one level down. `count(*) GROUP BY yr, status` over a
    // partitioned warehouse table is answered from partition DIRECTORY
    // values + per-file footer counts (per-group min/max folds the
    // slice's footer stats), again twice in one statement: bare (the
    // manifest walk; WarehouseSqlSpec pins the LocalRelation plan) and
    // under `WHERE id >= 0` (the scan). Group values re-enter typed
    // through the same string→type cast the scan path applies to
    // partition dirs — the int year and the string status both
    // round-trip. At 100 TB this is THE freshness dashboard query
    // (rows per day per source), served without opening a file. ----
    Q("q134_warehouse_meta_partition_counts",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q134-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("pt" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("yr", IntegerType),
              StructField("status", StringType),
              StructField("val", DoubleType))),
            partitionBy = Seq("yr", "status"),
            statColumns = Seq("id"))))
        wh.bootstrap()
        wh.registerSql("meta134_")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"),
            year(col("o_orderdate")).as("yr"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("meta134_src")
        s.sql("INSERT INTO meta134_pt SELECT * FROM meta134_src WHERE id % 3 <> 0")
        s.sql("INSERT INTO meta134_pt SELECT * FROM meta134_src WHERE id % 3 = 0")
        s.sql("DELETE FROM meta134_pt WHERE id % 53 = 0")
        val block =
          """SELECT yr, status, count(*) AS n_rows,
                    min(id) AS id_lo, max(id) AS id_hi
             FROM meta134_pt"""
        s.sql(s"""
          SELECT 'meta' AS src, m.* FROM ($block GROUP BY yr, status) m
          UNION ALL
          SELECT 'scan' AS src, sc.* FROM (
            $block WHERE id >= 0 GROUP BY yr, status) sc
          ORDER BY src, yr, status""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id,
                 CAST(year(o_orderdate) AS INTEGER) AS yr,
                 o_orderstatus AS status
          FROM orders),
        kept AS (SELECT * FROM base WHERE id % 53 <> 0),
        agg AS (
          SELECT yr, status, count(*) AS n_rows,
                 min(id) AS id_lo, max(id) AS id_hi
          FROM kept GROUP BY yr, status)
        SELECT s.src, a.yr, a.status, a.n_rows, a.id_lo, a.id_hi
        FROM (SELECT 'meta' AS src UNION ALL SELECT 'scan') s
        CROSS JOIN agg a ORDER BY s.src, a.yr, a.status""")),

    // ---- q135: STREAM-STREAM JOIN of two live warehouse sources under
    // the hash gate — the fact-enrichment composition
    // (WarehouseSourceSpec proves the restart semantics; this gates the
    // values). Facts and dims land in INTERLEAVED waves: wave 1 joins
    // only even-custkey facts (odd-custkey facts are HELD in join
    // state), wave 2 delivers the odd dims and must emit the held
    // facts exactly once — across an AvailableNow drain boundary and
    // an idle checkpointed restart. The joined event log then folds to
    // per-segment totals the oracle recomputes as a plain batch join:
    // a dropped held row, a double emission after restart, or a lost
    // source offset all break the hash. ----
    Q("q135_warehouse_stream_stream_join",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types._
        val root = graft.util.Scratch.dir("graft-q135-").toString
        val src = new graft.pipeline.Warehouse(s, s"$root/src",
          specs = Map(
            "fact" -> graft.pipeline.Warehouse.TableSpec(StructType(Seq(
              StructField("id", LongType, nullable = false),
              StructField("custkey", LongType),
              StructField("val", DoubleType)))),
            "dim" -> graft.pipeline.Warehouse.TableSpec(StructType(Seq(
              StructField("custkey", LongType, nullable = false),
              StructField("seg", StringType))))))
        src.bootstrap()
        val down = new graft.pipeline.Warehouse(s, s"$root/down",
          specs = Map("log" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("custkey", LongType),
              StructField("val", DoubleType),
              StructField("seg", StringType))))))
        down.bootstrap()
        def drain(): Unit = {
          val fact = s.readStream.format("graft-warehouse")
            .option("path", s"$root/src").option("table", "fact").load()
          val dim = s.readStream.format("graft-warehouse")
            .option("path", s"$root/src").option("table", "dim").load()
          val q = fact.join(dim, "custkey")
            .select(col("id"), col("custkey"), col("val"), col("seg"))
            .writeStream.format("graft-warehouse")
            .option("path", s"$root/down").option("table", "log")
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        val facts = t(s, dir, "orders").select(
          col("o_orderkey").as("id"), col("o_custkey").as("custkey"),
          col("o_totalprice").as("val"))
          .where(col("id") % 3 <= 1)
        val dims = t(s, dir, "customer").select(
          col("c_custkey").as("custkey"), col("c_mktsegment").as("seg"))
        src.append("fact", facts)                           // all facts
        src.append("dim", dims.where(col("custkey") % 2 === 0))
        drain()                   // wave 1: odd-custkey facts held
        src.append("dim", dims.where(col("custkey") % 2 === 1))
        drain()                   // wave 2: held facts emit exactly once
        drain()                   // idle restart: nothing re-emits
        down.read("log").groupBy(col("seg"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            round(sum(col("val")), 2).as("total"))
          .orderBy("seg")
      },
      Some("""
        WITH fact AS (
          SELECT o_orderkey AS id, o_custkey AS custkey,
                 o_totalprice AS "val"
          FROM orders WHERE o_orderkey % 3 <= 1),
        dim AS (
          SELECT c_custkey AS custkey, c_mktsegment AS seg FROM customer)
        SELECT d.seg, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(f."val"), 2) AS total
        FROM fact f JOIN dim d USING (custkey)
        GROUP BY d.seg ORDER BY d.seg""")),

    // ---- q136: MERGE-ON-READ deletion vectors under the hash gate —
    // the thin-delete ladder no 100 TB table can live without. Two
    // vectored DELETEs (sidecar positions, zero files rewritten —
    // WarehouseDvSpec pins the inputFiles invariant), a copy-on-write
    // UPDATE that MATERIALIZES the vectors mid-history, a third
    // vectored DELETE over the rewritten files, a time-travel read of
    // the pre-delete version (vectors must not corrupt history), and
    // the final per-group state — all replayed relationally by the
    // oracle. A resurfaced deleted row, a vector applied to the wrong
    // file, or history bleeding through the sidecars breaks the hash.
    Q("q136_warehouse_deletion_vectors",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q136-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", StringType),
              StructField("val", DoubleType))),
            statColumns = Seq("id"))))
        wh.bootstrap()
        wh.registerSql("dv136_")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"),
            concat(lit("g"), col("o_orderkey") % 5).as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("dv136_src")
        s.sql("INSERT INTO dv136_t SELECT * FROM dv136_src") // v2
        s.conf.set("spark.graft.delete.mode", "dv")
        try {
          s.sql("DELETE FROM dv136_t WHERE id % 7 = 0")   // vector 1
          s.sql("DELETE FROM dv136_t WHERE id % 11 = 0")  // vector union
          s.conf.set("spark.graft.delete.mode", "cow")
          s.sql("UPDATE dv136_t SET val = val + 100 WHERE grp = 'g3'")
          s.conf.set("spark.graft.delete.mode", "dv")
          s.sql("DELETE FROM dv136_t WHERE id % 13 = 0")  // fresh vectors
        } finally s.conf.unset("spark.graft.delete.mode")
        s.sql("""
          SELECT 'final' AS section, grp,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 round(sum(val), 2) AS total
          FROM dv136_t GROUP BY grp
          UNION ALL
          SELECT 'v2' AS section, 'all' AS grp,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(NULL AS DOUBLE) AS total
          FROM dv136_t VERSION AS OF 2
          ORDER BY section, grp""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 5) AS grp,
                 o_totalprice AS "val"
          FROM orders),
        live AS (
          SELECT id, grp,
                 CASE WHEN grp = 'g3' THEN "val" + 100 ELSE "val" END AS "val"
          FROM base
          WHERE id % 7 <> 0 AND id % 11 <> 0 AND id % 13 <> 0)
        SELECT 'final' AS section, grp, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum("val"), 2) AS total
        FROM live GROUP BY grp
        UNION ALL
        SELECT 'v2' AS section, 'all' AS grp, CAST(count(*) AS BIGINT),
               CAST(NULL AS DOUBLE)
        FROM base
        ORDER BY section, grp""")),

    // ---- q137: MERGE-ON-READ DML feeding INCREMENTAL MV MAINTENANCE —
    // the exactness composition the deletion vectors must uphold.
    // Vectored UPDATE (old row vectors out, new version appends),
    // vectored DELETE, another vectored UPDATE over the freshly-
    // appended files, with an incremental view refresh in the middle
    // and at the end: each refresh folds the change feed, where a
    // grown vector arrives as −1 retractions of exactly the old row
    // versions. The view's count/sum/avg per group must equal the
    // oracle's from-scratch replay of the DML ladder — a missed
    // retraction, a double-counted append, or a vector applied to the
    // wrong file makes the fold drift and breaks the hash. Integer
    // cents keep the sums hash-exact. ----
    Q("q137_warehouse_mor_update_mv",
      (s, dir) => {
        import org.apache.spark.sql.types._
        import graft.pipeline.{MaterializedView => MV}
        val whDir = graft.util.Scratch.dir("graft-q137-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", StringType),
              StructField("cents", LongType))),
            statColumns = Seq("id"))))
        wh.bootstrap()
        val vd = MV.ViewDef("t", "mv", Seq("grp"),
          Seq(MV.Count("n_rows"), MV.Sum("cents", "total"),
            MV.Avg("cents", "mean")), nParts = 8)
        wh.append("t", t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 8).as("grp"),
          floor(col("o_totalprice") * 100).cast("long").as("cents")))
        MV.refresh(wh, vd) // full build
        wh.updateVectored("t", col("id") % 9 === 0,
          Map("cents" -> (col("cents") + 5000L)))
        wh.deleteVectored("t", col("id") % 4 === 0)
        MV.refresh(wh, vd) // fold a mixed +1/−1 vectored window
        wh.updateVectored("t", col("id") % 10 === 3,
          Map("cents" -> (col("cents") * 2L)))
        MV.refresh(wh, vd) // fold vectors grown over fresh files
        MV.read(wh, vd)
          .select(col("grp"), col("n_rows"), col("total"),
            round(col("mean"), 2).as("mean"))
          .orderBy("grp")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 8) AS grp,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        s1 AS (
          SELECT id, grp,
                 CASE WHEN id % 9 = 0 THEN cents + 5000 ELSE cents END
                   AS cents
          FROM base),
        s2 AS (SELECT * FROM s1 WHERE id % 4 <> 0),
        s3 AS (
          SELECT id, grp,
                 CASE WHEN id % 10 = 3 THEN cents * 2 ELSE cents END
                   AS cents
          FROM s2)
        SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS total,
               round(avg(cents), 2) AS mean
        FROM s3 GROUP BY grp ORDER BY grp""")),

    // ---- q138: BUCKETED warehouse tables — the co-located fact/dim
    // layout (`CLUSTERED BY (k) INTO n BUCKETS`). Both sides hash-
    // place rows into pmod(murmur3(custkey), 8) file groups at write
    // time; the scan reports that partitioning, so the merge join runs
    // with ZERO shuffle exchanges (WarehouseBucketSpec pins the plan —
    // here the hash gate proves the exchange-free path computes the
    // same answer as DuckDB's shuffle-free-by-luck single-node join).
    // The compact between the two appends rewrites files THROUGH the
    // layout — the rewrite that silently mis-stamps if the placement
    // shuffle gets elided (see Warehouse.writeBatch). At 100 TB this
    // layout turns every fact-fact/fact-dim join and bucket-key
    // aggregation from a full-table shuffle into a local zip. ----
    Q("q138_warehouse_bucketed_join",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q138-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map(
            "o" -> graft.pipeline.Warehouse.TableSpec(
              StructType(Seq(
                StructField("custkey", LongType),
                StructField("price", DoubleType))),
              bucketBy = Seq("custkey"), numBuckets = 8),
            "c" -> graft.pipeline.Warehouse.TableSpec(
              StructType(Seq(
                StructField("custkey", LongType),
                StructField("segment", StringType))),
              bucketBy = Seq("custkey"), numBuckets = 8)))
        wh.bootstrap()
        val orders = t(s, dir, "orders")
          .select(col("o_custkey").as("custkey"),
            col("o_totalprice").as("price"))
        wh.append("o", orders.where(col("custkey") % 2 === 0))
        wh.append("o", orders.where(col("custkey") % 2 =!= 0))
        wh.compact("o") // rewrite under the layout, mid-lifecycle
        wh.append("c", t(s, dir, "customer")
          .select(col("c_custkey").as("custkey"),
            col("c_mktsegment").as("segment")))
        // hint forces the sort-merge path (a broadcast at this SF would
        // bypass the bucket layout the query is about); with both sides
        // bucketed the join needs no exchange at any scale
        wh.read("o").hint("merge")
          .join(wh.read("c"), "custkey")
          .groupBy("segment")
          .agg(count(lit(1)).as("n_orders"),
            countDistinct(col("custkey")).as("n_customers"),
            round(sum(col("price")), 2).as("revenue"))
          .orderBy("segment")
      },
      Some("""
        SELECT c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // ---- q139: COPY INTO — idempotent bulk file ingest (the Delta
    // statement). Two waves of parquet files land in a directory;
    // COPY INTO runs after each wave, with a deliberate re-run in
    // between. The re-run must load NOTHING (each source file's
    // fingerprint is remembered on the manifest itself) and the third
    // run must load ONLY wave 2 — if idempotence breaks, wave 1 counts
    // double and the hash breaks. The oracle is the plain aggregate of
    // all rows, which is only reachable by exactly-once ingest. ----
    Q("q139_warehouse_copy_into",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q139-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", StringType),
              StructField("price", DoubleType))))))
        wh.bootstrap()
        val src = s"$whDir/landing"
        val orders = t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 7).as("grp"),
          col("o_totalprice").as("price"))
        orders.where(col("id") % 3 === 0)
          .write.mode("overwrite").parquet(s"$src/w1")
        wh.copyInto("t", src)
        wh.copyInto("t", src) // no-op: nothing new landed
        orders.where(col("id") % 3 =!= 0)
          .write.mode("overwrite").parquet(s"$src/w2")
        wh.copyInto("t", src) // loads ONLY wave 2
        wh.read("t").groupBy("grp")
          .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))
          .orderBy("grp")
      },
      Some("""
        SELECT 'g' || (o_orderkey % 7) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- q140: COLUMN MAPPING lifecycle under the hash gate — rename
    // and drop as PURE METADATA (zero data files rewritten; Delta's
    // column-mapping shape). Wave 1 lands under the original name,
    // the column is renamed, wave 2 lands under the NEW name (the
    // files now mix physical names), a routed UPDATE mutates through
    // the mapping, a drop retires one column, and a re-add of the
    // SAME logical name must come back all-NULL — if the retired
    // physical column resurfaced, the n_flagged count would jump and
    // the hash would break. ----
    Q("q140_warehouse_column_mapping",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q140-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", StringType),
              StructField("price", DoubleType),
              StructField("flag", LongType))))))
        wh.bootstrap()
        wh.registerSql("cm140_")
        val orders = t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 5).as("grp"),
          col("o_totalprice").as("price"),
          (col("o_orderkey") % 2).as("flag"))
        wh.append("t", orders.where(col("id") % 2 === 0))
        s.sql("ALTER TABLE cm140_t RENAME COLUMN price TO amount")
        wh.append("t", orders.where(col("id") % 2 =!= 0)
          .withColumnRenamed("price", "amount"))
        s.sql("UPDATE cm140_t SET amount = amount + 10 WHERE grp = 'g2'")
        s.sql("ALTER TABLE cm140_t DROP COLUMN flag")
        s.sql("ALTER TABLE cm140_t ADD COLUMN flag BIGINT")
        s.sql("""
          SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 round(sum(amount), 2) AS total,
                 CAST(count(flag) AS BIGINT) AS n_flagged
          FROM cm140_t GROUP BY grp ORDER BY grp""")
      },
      Some("""
        SELECT 'g' || (o_orderkey % 5) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CASE WHEN o_orderkey % 5 = 2
                              THEN o_totalprice + 10
                              ELSE o_totalprice END), 2) AS total,
               CAST(0 AS BIGINT) AS n_flagged
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- q141: EXPECTATIONS WITH QUARANTINE — the "expect or
    // quarantine" pipeline contract: one batch splits by the target's
    // CHECK constraints into kept rows and quarantined rows carrying
    // FIRST-FAIL attribution (name order), in one atomic multi-table
    // commit. The oracle replays the same CASE ladder; the section
    // totals only reconcile (kept + quarantined = batch) if the split
    // is exactly-once and the attribution deterministic. ----
    Q("q141_warehouse_quarantine",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q141-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("status", StringType),
              StructField("price", DoubleType))),
            checks = Map(
              "a_price_cap" -> "price < 400000",
              "b_no_f_status" -> "status <> 'F'"))))
        wh.bootstrap()
        val batch = t(s, dir, "orders").select(
          col("o_orderkey").as("id"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        wh.appendQuarantine("t", "t_bad", batch)
        wh.read("t")
          .select(lit("kept").as("section"), lit("-").as("violation"),
            col("price"))
          .unionByName(wh.read("t_bad")
            .select(lit("quarantined").as("section"), col("violation"),
              col("price")))
          .groupBy("section", "violation")
          .agg(count(lit(1)).as("n"), round(sum("price"), 2).as("total"))
          .orderBy("section", "violation")
      },
      Some("""
        WITH tagged AS (
          SELECT o_totalprice AS price,
                 CASE WHEN NOT (o_totalprice < 400000) THEN 'a_price_cap'
                      WHEN NOT (o_orderstatus <> 'F') THEN 'b_no_f_status'
                      END AS violation
          FROM orders)
        SELECT CASE WHEN violation IS NULL THEN 'kept'
                    ELSE 'quarantined' END AS section,
               coalesce(violation, '-') AS violation,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(price), 2) AS total
        FROM tagged GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- q142: SCD TYPE-2 MERGE — versioned dimension maintenance.
    // Wave 1 loads the customer dimension; wave 2 upgrades every
    // custkey % 3 == 0 segment and lands a synthetic batch of new
    // members. Changed keys must CLOSE their old version (frozen with
    // the wave-2 timestamp) and insert a new current one; unchanged
    // keys must be exact no-ops (null-safe compare); new keys insert.
    // The oracle replays the ladder set-theoretically — a double
    // insert, a missed close, or a spurious close of an unchanged key
    // each shifts a group count and breaks the hash. ----
    Q("q142_warehouse_scd2_dimension",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q142-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("dim" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("segment", StringType),
              StructField("nation", LongType),
              StructField("valid_from", TimestampType),
              StructField("valid_to", TimestampType),
              StructField("is_current", BooleanType))))))
        wh.bootstrap()
        val base = t(s, dir, "customer").select(
          col("c_custkey").as("id"),
          col("c_mktsegment").as("segment"),
          col("c_nationkey").cast("long").as("nation"))
        def ts(v: String) = lit(v).cast(TimestampType)
        wh.scdMerge("dim", base, Seq("id"), ts("2024-01-01 00:00:00"))
        val wave2 = base
          .withColumn("segment", when(col("id") % 3 === 0,
            lit("UPGRADED")).otherwise(col("segment")))
          .unionByName(base.where(col("id") < 50)
            .select((col("id") + 10000000L).as("id"),
              lit("NEWCO").as("segment"), col("nation")))
        wh.scdMerge("dim", wave2, Seq("id"), ts("2024-02-01 00:00:00"))
        wh.read("dim")
          .groupBy("is_current", "segment")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("valid_to")).as("n_close_ts"))
          .orderBy("is_current", "segment")
      },
      Some("""
        WITH base AS (
          SELECT c_custkey AS id, c_mktsegment AS seg FROM customer),
        rows_ AS (
          SELECT CASE WHEN id % 3 = 0 THEN 'UPGRADED' ELSE seg END AS segment,
                 true AS is_current, NULL AS valid_to
          FROM base
          UNION ALL
          SELECT 'NEWCO', true, NULL FROM base WHERE id < 50
          UNION ALL
          SELECT seg, false, '2024-02-01' FROM base WHERE id % 3 = 0)
        SELECT is_current, segment, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT valid_to) AS BIGINT) AS n_close_ts
        FROM rows_ GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- q143: CLUSTER TOPIC LABELING (the BERTopic / data-map
    // shape): assign every embedding to its nearest of K fixed
    // centroids (argmax dot — closed-form literals so an independent
    // engine replays the assignment bit-exactly: dot products are
    // pure IEEE mul/add chains over identical doubles in identical
    // order, no libm), then label each cluster with its top c-TF-IDF
    // terms over the joined documents. The idf here is the LINEAR
    // variant (K + 1 − cluster-df) so scores stay integer-exact
    // across engines — the classic ln(K/df) is a one-line swap whose
    // last-ulp libm differences would make cross-engine rank order
    // unverifiable. Ranking ties break on the term itself. ----
    Q("q143_embed_cluster_topics",
      (s, dir) => {
        val K = 4
        val dim = 64
        def cent(k: Int): Array[Double] = (0 until dim).map(j =>
          (((k + 1) * ((j % 5) + 1)) - 6) * 0.05).toArray
        val scoredK = (0 until K).map { k =>
          val dot = aggregate(
            zip_with(col("embedding").cast("array<double>"),
              lit(cent(k)), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x)
          // max over (dot, -k) structs = argmax dot, ties -> smaller k
          struct(dot.as("dot"), lit(-k).as("negk"))
        }
        val assigned = t(s, dir, "embeddings")
          .select(col("vec_id"),
            (-array_max(array(scoredK: _*)).getField("negk"))
              .cast("long").as("cluster"))
        val toks = t(s, dir, "documents")
          .join(assigned, col("doc_id") === col("vec_id"))
          .select(col("cluster"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .where(length(col("term")) > 0)
        val tf = toks.groupBy("cluster", "term")
          .agg(count(lit(1)).as("cnt"))
        val dfc = tf.groupBy("term")
          .agg(countDistinct(col("cluster")).as("dfc"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster")
          .orderBy(col("score").desc, col("term"))
        tf.join(dfc, "term")
          .withColumn("score",
            (col("cnt") * (lit(K.toLong + 1) - col("dfc"))).cast("long"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select(col("cluster"), col("rank"), col("term"), col("score"))
          .orderBy("cluster", "rank")
      },
      Some("""
        WITH cents AS (
          SELECT k, list_transform(range(0, 64),
                   j -> (((k + 1) * ((j % 5) + 1)) - 6) * 0.05) AS c
          FROM (SELECT unnest(range(0, 4)) AS k)),
        dots AS (
          SELECT e.vec_id, c.k,
                 list_dot_product(e.embedding::DOUBLE[], c.c) AS dot
          FROM embeddings e CROSS JOIN cents c),
        assigned AS (
          SELECT vec_id, CAST(k AS BIGINT) AS cluster FROM (
            SELECT vec_id, k, row_number() OVER (
              PARTITION BY vec_id ORDER BY dot DESC, k) AS rn
            FROM dots) WHERE rn = 1),
        toks AS (
          SELECT a.cluster, t.term FROM documents d
          JOIN assigned a ON a.vec_id = d.doc_id,
          UNNEST(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
          WHERE len(t.term) > 0),
        tf AS (
          SELECT cluster, term, count(*) AS cnt
          FROM toks GROUP BY 1, 2),
        dfc AS (
          SELECT term, count(DISTINCT cluster) AS dfc FROM tf GROUP BY 1),
        ranked AS (
          SELECT f.cluster, f.term,
                 CAST(f.cnt * (5 - x.dfc) AS BIGINT) AS score,
                 row_number() OVER (PARTITION BY f.cluster
                   ORDER BY f.cnt * (5 - x.dfc) DESC, f.term) AS rank
          FROM tf f JOIN dfc x USING (term))
        SELECT cluster, CAST(rank AS BIGINT) AS rank, term, score
        FROM ranked WHERE rank <= 5 ORDER BY cluster, rank""")),

    // ---- q144: GENERATED COLUMNS / HIDDEN PARTITIONING — the table
    // is partitioned on `event_date GENERATED ALWAYS AS (CAST(ts AS
    // DATE))`; the INSERT omits the column entirely and the engine
    // derives the partition key (the Iceberg hidden-partitioning
    // contract, expressed the Delta generated-column way). The final
    // aggregate groups by the DERIVED column — if derivation drifted
    // from CAST(ts AS DATE) by even one row the hash breaks. A second
    // wave arrives WITH the column present (verified, not re-derived)
    // to pin the dual contract. ----
    Q("q144_warehouse_generated_partitioning",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q144-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("ev" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("event_id", LongType),
              StructField("ts", TimestampType),
              StructField("event_type", StringType),
              StructField("value", DoubleType),
              StructField("event_date", DateType))),
            partitionBy = Seq("event_date"),
            generated = Map("event_date" -> "CAST(ts AS DATE)"))))
        wh.bootstrap()
        val ev = t(s, dir, "events").select(
          col("event_id"), col("ts"), col("event_type"), col("value"))
        wh.append("ev", ev.where(col("event_id") % 2 === 0)) // derived
        wh.append("ev", ev.where(col("event_id") % 2 =!= 0)  // provided
          .withColumn("event_date", col("ts").cast(DateType)))
        wh.read("ev")
          .groupBy("event_date", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("event_date", "event_type")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum("value"), 2) AS total
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- q145: EPOCH-AWARE DETERMINISTIC GLOBAL SHUFFLE — the
    // training-dataloader order: every epoch visits the whole corpus
    // in a different but fully reproducible order (resume a crashed
    // run mid-epoch, shard the same order across workers, replay an
    // ablation bit-for-bit). The shuffle key is an LCG over exact
    // integer arithmetic — no float, no libm, so any engine replays
    // it. Scale shape: the per-epoch head is TakeOrdered (top-k per
    // partition, merge k), never a global single-partition window;
    // the full-epoch order is just ORDER BY (a distributed range
    // sort) when a consumer wants all of it. ----
    Q("q145_docs_epoch_shuffle",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch")
          .orderBy(col("shuffle_key"), col("doc_id"))
        Seq(0L, 1L, 2L).map { ep =>
          docs.select(lit(ep).as("epoch"), col("doc_id"),
            ((col("doc_id") * lit(48271L) + lit(ep * 7919L + 11L))
              % lit(2147483647L)).as("shuffle_key"))
            .orderBy("shuffle_key", "doc_id")
            .limit(10) // TakeOrdered: distributed top-k, bounded
        }.reduce(_ unionByName _)
          // the window runs over 10-row epoch groups, not the corpus
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(col("epoch"), col("rank"), col("doc_id"),
            col("shuffle_key"))
          .orderBy("epoch", "rank")
      },
      Some("""
        WITH eps AS (SELECT unnest(range(0, 3)) AS epoch),
        keyed AS (
          SELECT e.epoch, d.doc_id,
                 (d.doc_id * 48271 + e.epoch * 7919 + 11)
                   % 2147483647 AS shuffle_key
          FROM documents d CROSS JOIN eps e),
        ranked AS (
          SELECT epoch, doc_id, shuffle_key,
                 row_number() OVER (PARTITION BY epoch
                   ORDER BY shuffle_key, doc_id) AS rank
          FROM keyed)
        SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank,
               doc_id, CAST(shuffle_key AS BIGINT) AS shuffle_key
        FROM ranked WHERE rank <= 10 ORDER BY epoch, rank""")),

    // ---- q146: STREAMING dedupe-on-arrival through the PERSISTED
    // signature index — the unified curation path (one signature store,
    // batch + streaming maintainers). Two sequential AvailableNow runs
    // over one landing dir (epoch A: groups 0..299; epoch B: groups
    // 200..399) dedupe against the SAME warehouse index the batch
    // ladder maintains: in-epoch dups fall to keep-first, cross-epoch
    // dups fall to the index anti-join on the STORED sigkey column.
    // Texts are built so distinct groups share ZERO token shingles
    // (every token embeds the group id), making signature-dedup
    // provably equal to group-dedup — which DuckDB replays as
    // min(doc_id) per group. First-wins is deterministic because every
    // group's full row set arrives within a single epoch.
    Q("q146_docs_streaming_dedup_indexed",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q146-").toString
        val mk = t(s, dir, "orders")
          .select(col("o_orderkey").cast("long").as("doc_id"),
            (col("o_orderkey") % 400).cast("int").as("grp"))
          .withColumn("text", concat_ws(" ", expr(
            "transform(sequence(1, 6), i -> concat('w', i, 'g', grp))")))
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("grp", IntegerType),
          StructField("text", StringType)))
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("acc" -> graft.pipeline.Warehouse.TableSpec(schema)))
        wh.bootstrap()
        mk.where(col("grp") < 300)
          .coalesce(1).write.mode("append").parquet(s"$tmp/src")
        graft.streaming.StreamingIngest.dedupeOnArrivalStream(
          s, s"$tmp/src", schema, wh, "acc", "sig_idx", s"$tmp/ckpt")
          .awaitTermination()
        mk.where(col("grp") >= 200)
          .coalesce(1).write.mode("append").parquet(s"$tmp/src")
        graft.streaming.StreamingIngest.dedupeOnArrivalStream(
          s, s"$tmp/src", schema, wh, "acc", "sig_idx", s"$tmp/ckpt")
          .awaitTermination()
        wh.read("acc").select(col("doc_id"), col("grp")).orderBy("grp")
      },
      Some("""
        SELECT CAST(min(o_orderkey) AS BIGINT) AS doc_id,
               CAST(o_orderkey % 400 AS INT) AS grp
        FROM orders GROUP BY 2 ORDER BY grp""")),

    // ---- q147: JOIN-DRIVEN OPT-OUT PURGE — the GDPR/revocation path
    // at corpus scale. The doomed set is DERIVED (every doc whose
    // n_chars lands on the revoked residue — data-sized, could be
    // millions at 100 TB) and is applied through Warehouse.deleteKeys:
    // distributed semi/anti joins inside the copy-on-write rewrite, no
    // IN-list plan, no O(|revoked|) driver state. The gate recomputes
    // the survivor aggregate per source in DuckDB.
    Q("q147_docs_optout_purge",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q147-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("docs" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("doc_id", LongType),
              StructField("source", StringType),
              StructField("n_chars", LongType))))))
        wh.bootstrap()
        wh.append("docs", t(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("source"),
            col("n_chars").cast("long")))
        val revoked = wh.read("docs")
          .where(col("n_chars") % 7 === 0).select("doc_id")
        val removed = wh.deleteKeys("docs", revoked, Seq("doc_id"))
        require(removed >= 0L)
        wh.read("docs").groupBy("source")
          .agg(count(lit(1)).as("n"), min("doc_id").as("id_lo"),
            max("doc_id").as("id_hi"), sum("n_chars").as("chars"))
          .orderBy("source")
      },
      Some("""
        SELECT source, count(*) AS n,
               CAST(min(doc_id) AS BIGINT) AS id_lo,
               CAST(max(doc_id) AS BIGINT) AS id_hi,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE n_chars % 7 <> 0
        GROUP BY source ORDER BY source""")),

    // ---- q148: MIN/MAX MATERIALIZED VIEW maintained through
    // RETRACTING DML — the r9 bounded-repair path under the hash gate.
    // Build a count/sum/min/max view, then DELETE rows (some evict
    // group minima, some don't) and UPDATE values (retract + assert
    // pairs); each refresh must take the targeted-repair merge path
    // (MaterializedViewSpec pins the plan shape; here the CONTENTS are
    // gated against DuckDB's full recompute over the same DML result).
    // Values stay integral-scaled doubles so sums hash exactly.
    Q("q148_orders_matview_minmax_dml",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q148-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true,
          specs = Map("o" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", IntegerType),
              StructField("val", DoubleType))))))
        wh.bootstrap()
        wh.append("o", t(s, dir, "orders")
          .select(col("o_orderkey").cast("long").as("id"),
            (col("o_orderkey") % 50).cast("int").as("grp"),
            col("o_totalprice").as("val")))
        val vd = graft.pipeline.MaterializedView.ViewDef("o", "mv",
          Seq("grp"), Seq(
            graft.pipeline.MaterializedView.Count("n"),
            graft.pipeline.MaterializedView.Sum("val", "total"),
            graft.pipeline.MaterializedView.Min("val", "lo"),
            graft.pipeline.MaterializedView.Max("val", "hi")),
          nParts = 8)
        graft.pipeline.MaterializedView.refresh(wh, vd) // full build
        wh.delete("o", col("id") % 9 === 0)             // evicts extrema
        graft.pipeline.MaterializedView.refresh(wh, vd) // targeted repair
        wh.update("o", col("id") % 11 === 0,
          Map("val" -> (col("val") + 100.0)))           // retract+assert
        graft.pipeline.MaterializedView.refresh(wh, vd)
        graft.pipeline.MaterializedView.read(wh, vd)
          .select(col("grp"), col("n"),
            round(col("total"), 2).as("total"), col("lo"), col("hi"))
          .orderBy("grp")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id,
                 CAST(o_orderkey % 50 AS INT) AS grp,
                 o_totalprice AS val
          FROM orders),
        kept AS (SELECT * FROM base WHERE id % 9 <> 0),
        mutated AS (
          SELECT id, grp,
                 CASE WHEN id % 11 = 0 THEN val + 100.0 ELSE val END AS val
          FROM kept)
        SELECT grp, count(*) AS n, round(sum(val), 2) AS total,
               min(val) AS lo, max(val) AS hi
        FROM mutated GROUP BY grp ORDER BY grp""")),

    // ---- q149: PER-FILE NDV SKETCHES under the hash gate — the
    // Iceberg-puffin surface. Each committed file carries an HLL
    // distinct-count sketch per declared ndv column (written in the
    // bloom pass); the snapshot NDV is the union over live files and
    // feeds the optimizer as CatalogColumnStat. Cardinalities here stay
    // below the sketch's coupon-list capacity, where DataSketches HLL
    // is EXACT — so the estimates must hash-match DuckDB's exact
    // count(DISTINCT) even across multi-file appends and a
    // copy-on-write DELETE that re-sketches the touched files.
    Q("q149_warehouse_ndv_stats",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q149-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("o" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("status", StringType),
              StructField("prio", StringType),
              StructField("bucket", LongType))),
            statColumns = Seq("id"),
            ndvColumns = Seq("status", "prio", "bucket"))))
        wh.bootstrap()
        val src = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          (col("o_orderkey") % 50).as("bucket"))
        wh.append("o", src.where(col("id") % 2 === 0))
        wh.append("o", src.where(col("id") % 2 === 1))
        wh.delete("o", col("id") % 97 === 0)
        val est = wh.ndvEstimates("o", wh.loadLatest("o")._2)
        import s.implicits._
        est.toSeq.sortBy(_._1).toDF("col", "ndv")
      },
      Some("""
        WITH kept AS (
          SELECT o_orderstatus AS status, o_orderpriority AS prio,
                 o_orderkey % 50 AS bucket
          FROM orders WHERE o_orderkey % 97 <> 0)
        SELECT 'bucket' AS col, count(DISTINCT bucket) AS ndv FROM kept
        UNION ALL
        SELECT 'prio', count(DISTINCT prio) FROM kept
        UNION ALL
        SELECT 'status', count(DISTINCT status) FROM kept
        ORDER BY col""")),

    // ---- q150: VERSIONED CHANGE FEED (Delta CDF's _commit_version) —
    // per-commit attribution under the hash gate. Two inserts, a
    // copy-on-write DELETE and an UPDATE; the feed's per-commit net row
    // delta and δ-weighted value sum are exact REGARDLESS of file
    // layout (rewrite re-emissions cancel pairwise within their own
    // commit), so DuckDB replays them from the DML definitions alone.
    // Versions are deterministic: v1 bootstrap, v2/v3 inserts,
    // v4 delete, v5 update.
    Q("q150_warehouse_cdf_versioned",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q150-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("val", DoubleType))))))
        wh.bootstrap()
        val src = t(s, dir, "orders")
          .select(col("o_orderkey").cast("long").as("id"),
            col("o_totalprice").as("val"))
        wh.append("t", src.where(col("id") % 2 === 0))
        wh.append("t", src.where(col("id") % 2 === 1))
        wh.delete("t", col("id") % 13 === 0)
        wh.update("t", col("id") % 31 === 0,
          Map("val" -> (col("val") + 7.0)))
        wh.readChangeFeedVersioned("t", 1L)
          .groupBy(col("_commit_version").as("v"))
          .agg(sum(col("_change_delta")).as("net_rows"),
            round(sum(col("val") * col("_change_delta")), 2).as("net_val"))
          .orderBy("v")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_totalprice AS val FROM orders),
        v2 AS (SELECT * FROM base WHERE id % 2 = 0),
        v3 AS (SELECT * FROM base WHERE id % 2 = 1),
        v4 AS (SELECT * FROM base WHERE id % 13 = 0),
        v5 AS (SELECT * FROM base WHERE id % 31 = 0 AND id % 13 <> 0)
        SELECT CAST(2 AS BIGINT) AS v, count(*) AS net_rows,
               round(sum(val), 2) AS net_val FROM v2
        UNION ALL
        SELECT 3, count(*), round(sum(val), 2) FROM v3
        UNION ALL
        SELECT 4, -count(*), round(-sum(val), 2) FROM v4
        UNION ALL
        SELECT 5, 0, round(7.0 * count(*), 2) FROM v5
        ORDER BY v""")),

    // ---- q151: MERGE INTO with WHEN NOT MATCHED BY SOURCE — the
    // full-sync idiom (upsert what the source has, age out what it no
    // longer has) in ONE statement and ONE commit, under the hash gate.
    // By-source candidacy outside the touched partitions is discovered
    // file-targeted (the mergeInto contract: those rows are unmatched
    // by construction, so only files containing a row satisfying a
    // by-source condition are rewritten). Clause order is Delta's:
    // delete before update on both the matched and the by-source side.
    Q("q151_warehouse_merge_sync",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q151-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("status", StringType),
              StructField("val", DoubleType))),
            statColumns = Seq("id"))))
        wh.bootstrap()
        wh.registerSql("ms151_")
        val base = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("val"))
        wh.append("t", base)
        // source: doubled-value upserts for id%3, brand-new rows for
        // id%50 (shifted key space), nothing for the rest
        base.where(col("id") % 3 === 0)
          .select(col("id"), lit("S").as("status"),
            (col("val") * 2).as("val"))
          .unionByName(base.where(col("id") % 50 === 0)
            .select((col("id") + 100000000L).as("id"),
              lit("N").as("status"), col("val")))
          .createOrReplaceTempView("ms151_src")
        s.sql("""
          MERGE INTO ms151_t AS t USING ms151_src AS s ON t.id = s.id
          WHEN MATCHED AND s.val > 300000 THEN DELETE
          WHEN MATCHED THEN UPDATE SET status = s.status, val = s.val
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.val < 1000 THEN DELETE
          WHEN NOT MATCHED BY SOURCE AND t.id % 7 = 0 THEN UPDATE
            SET status = 'Z'
        """)
        s.sql("""
          SELECT status, count(*) AS n, round(sum(val), 2) AS sv
          FROM ms151_t GROUP BY status ORDER BY status""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS status,
                 o_totalprice AS val
          FROM orders),
        src AS (
          SELECT id, 'S' AS status, val * 2 AS val FROM base
          WHERE id % 3 = 0
          UNION ALL
          SELECT id + 100000000, 'N', val FROM base WHERE id % 50 = 0),
        kept_matched AS (
          SELECT b.id, s.status, s.val
          FROM base b JOIN src s ON b.id = s.id
          WHERE s.val <= 300000),
        kept_unmatched AS (
          SELECT id,
                 CASE WHEN id % 7 = 0 THEN 'Z' ELSE status END AS status,
                 val
          FROM base
          WHERE id NOT IN (SELECT id FROM src) AND NOT (val < 1000)),
        inserts AS (
          SELECT id, status, val FROM src
          WHERE id NOT IN (SELECT id FROM base)),
        final AS (
          SELECT * FROM kept_matched UNION ALL
          SELECT * FROM kept_unmatched UNION ALL
          SELECT * FROM inserts)
        SELECT status, count(*) AS n, round(sum(val), 2) AS sv
        FROM final GROUP BY status ORDER BY status""")),

    // ---- q152: DEEP CLONE — a self-contained physical copy (Delta's
    // CREATE TABLE ... DEEP CLONE). The clone owns byte-identical
    // copies of every live data file (and stat sidecars), so DROPPING
    // THE SOURCE afterwards cannot dangle it — which is exactly what
    // this query does before reading a single row. The aggregate gates
    // that the clone carries the source's full post-DML state (two
    // appends and a copy-on-write DELETE) with no borrowed references.
    Q("q152_warehouse_deep_clone",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q152-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("src" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("grp", IntegerType),
              StructField("val", DoubleType))),
            statColumns = Seq("id"))))
        wh.bootstrap()
        val base = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          (col("o_orderkey") % 20).cast("int").as("grp"),
          col("o_totalprice").as("val"))
        wh.append("src", base.where(col("id") % 2 === 0))
        wh.append("src", base.where(col("id") % 2 === 1))
        wh.delete("src", col("id") % 13 === 0)
        wh.deepClone("src", "copy")
        wh.dropTable("src") // the clone must survive its source
        wh.read("copy").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("sv"))
          .orderBy("grp")
      },
      Some("""
        WITH kept AS (
          SELECT o_orderkey AS id,
                 CAST(o_orderkey % 20 AS INT) AS grp,
                 o_totalprice AS val
          FROM orders WHERE o_orderkey % 13 <> 0)
        SELECT grp, count(*) AS n, round(sum(val), 2) AS sv
        FROM kept GROUP BY grp ORDER BY grp""")),

    // ---- q153: AUTOMATIC ADDITIVE SCHEMA EVOLUTION (Delta's
    // mergeSchema) — a second batch carries a column the table never
    // declared (prio) and OMITS one it did (val); appendMergeSchema
    // widens the spec (nullable add), old files read the new column as
    // null, and the omitted column fills with typed nulls. The
    // aggregate gates both null surfaces at once: count(val) counts
    // only batch-1 rows, sum(val) over an all-batch-2 group is NULL.
    Q("q153_orders_schema_evolution",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val tmp = graft.util.Scratch.dir("graft-q153-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("id", LongType),
              StructField("val", DoubleType))))))
        wh.bootstrap()
        val base = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          col("o_totalprice").as("val"),
          col("o_orderpriority").as("prio"))
        wh.append("t", base.select(col("id"), col("val"))
          .where(col("id") % 2 === 0))
        wh.appendMergeSchema("t", base.select(col("id"), col("prio"))
          .where(col("id") % 2 === 1))
        wh.read("t")
          .groupBy(coalesce(col("prio"), lit("none")).as("prio"))
          .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("sv"),
            count(col("val")).as("n_val"))
          .orderBy("prio")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey AS id, o_totalprice AS val,
                 CAST(NULL AS VARCHAR) AS prio
          FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL
          SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
          FROM orders WHERE o_orderkey % 2 = 1)
        SELECT coalesce(prio, 'none') AS prio, count(*) AS n,
               round(sum(val), 2) AS sv, count(val) AS n_val
        FROM t GROUP BY 1 ORDER BY 1""")),

    // ---- q154: ENFORCED PRIMARY KEY under the gate — the reference's
    // Postgres `PRIMARY KEY` (script.py:78-82) made real. A colliding
    // INSERT is rejected WHOLE (the hash proves no row of it leaked),
    // then a mixed batch goes through the quarantine path: fresh keys
    // land, live-key collisions, a batch-internal duplicate pair and a
    // NULL key all route to the quarantine table as `primary_key`
    // violations. The collision probe file-skips by the batch's own
    // key extrema over the manifest's footer stats (STATS BY (id)) —
    // at 100 TB it reads only files whose key range overlaps the
    // batch, not the table.
    Q("q154_warehouse_primary_key",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q154-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("pk154_")
        s.sql("""CREATE TABLE pk154_t (
                   id BIGINT PRIMARY KEY, grp STRING, val DOUBLE
                 ) STATS BY (id)""")
        val base = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          col("o_orderstatus").as("grp"),
          col("o_totalprice").as("val"))
        base.createOrReplaceTempView("pk154_src")
        s.sql("INSERT INTO pk154_t SELECT * FROM pk154_src")
        // a colliding INSERT rejects WHOLE — even its non-colliding
        // rows must not land (the hash would catch a leak)
        val threw =
          try {
            s.sql("""INSERT INTO pk154_t
                     SELECT id + 200000000, 'LEAK', val FROM pk154_src
                     WHERE id % 5 = 0
                     UNION ALL
                     SELECT id, 'COLLIDE', val FROM pk154_src
                     WHERE id % 5 = 1""")
            false
          } catch {
            case _: graft.pipeline.Warehouse.PrimaryKeyViolation => true
          }
        require(threw, "q154: the colliding INSERT must be rejected")
        // quarantine path: fresh keys keep, collisions/dup-pair/null
        // key quarantine with primary_key attribution
        val mixed = base.where(col("id") % 10 === 0)
          .select((col("id") + 100000000L).as("id"),
            lit("NEW").as("grp"), col("val"))
          .unionByName(base.where(col("id") % 7 === 0)
            .select(col("id"), lit("DUP").as("grp"), col("val")))
          .unionByName(s.range(1).select(lit(-1L).as("id"),
            lit("DD").as("grp"), lit(1.0).as("val")))
          .unionByName(s.range(1).select(lit(-1L).as("id"),
            lit("DD").as("grp"), lit(2.0).as("val")))
          .unionByName(s.range(1).select(
            lit(null).cast("long").as("id"),
            lit("NN").as("grp"), lit(3.0).as("val")))
        wh.appendQuarantine("t", "t_bad", mixed)
        wh.registerSql("pk154_") // the new quarantine table routes too
        s.sql("""
          SELECT 'kept' AS side, grp, CAST(count(*) AS BIGINT) AS n,
                 round(sum(val), 2) AS sv
          FROM pk154_t GROUP BY grp
          UNION ALL
          SELECT 'quar' AS side, violation AS grp,
                 CAST(count(*) AS BIGINT) AS n, round(sum(val), 2) AS sv
          FROM pk154_t_bad GROUP BY violation
          ORDER BY side, grp""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 o_totalprice AS val
          FROM orders),
        kept AS (
          SELECT * FROM base
          UNION ALL
          SELECT id + 100000000, 'NEW', val FROM base WHERE id % 10 = 0),
        quar AS (
          SELECT val FROM base WHERE id % 7 = 0
          UNION ALL SELECT 1.0 UNION ALL SELECT 2.0 UNION ALL SELECT 3.0)
        SELECT 'kept' AS side, grp, count(*) AS n,
               round(sum(val), 2) AS sv
        FROM kept GROUP BY grp
        UNION ALL
        SELECT 'quar', 'primary_key', count(*), round(sum(val), 2)
        FROM quar
        ORDER BY side, grp""")),

    // ---- q155: VERSION TAGS under the gate (Iceberg's CREATE TAG) —
    // a tagged snapshot is PINNED: the copy-on-write DELETE/UPDATE
    // that follow eagerly GC their replaced files, and a RETAIN 1
    // VERSIONS vacuum sweeps everything else past retention — yet
    // `VERSION AS OF 'raw'` still reads the tagged snapshot in full.
    // The hash gates both worlds at once: the frozen tag side AND the
    // post-DML current side (a leaked pin or an over-eager GC breaks
    // one of them). Cost shape: a tag is one metadata file; pinning
    // costs gc/vacuum only the tagged manifests' entry lists.
    Q("q155_warehouse_tagged_snapshot",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q155-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("tag155_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("tag155_src")
        s.sql("""CREATE TABLE tag155_t (
                   id BIGINT, grp STRING, val DOUBLE)""")
        s.sql("INSERT INTO tag155_t SELECT * FROM tag155_src")
        s.sql("ALTER TABLE tag155_t CREATE TAG raw")
        s.sql("DELETE FROM tag155_t WHERE id % 3 = 0")
        s.sql("UPDATE tag155_t SET val = val * 2 WHERE grp = 'F'")
        s.sql("VACUUM tag155_t RETAIN 1 VERSIONS")
        s.sql("""
          SELECT 'now' AS side, grp, CAST(count(*) AS BIGINT) AS n,
                 round(sum(val), 2) AS sv
          FROM tag155_t GROUP BY grp
          UNION ALL
          SELECT 'tag' AS side, grp, CAST(count(*) AS BIGINT) AS n,
                 round(sum(val), 2) AS sv
          FROM tag155_t VERSION AS OF 'raw' GROUP BY grp
          ORDER BY side, grp""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 o_totalprice AS val
          FROM orders),
        now AS (
          SELECT id, grp,
                 CASE WHEN grp = 'F' THEN val * 2 ELSE val END AS val
          FROM base WHERE id % 3 <> 0)
        SELECT 'now' AS side, grp, count(*) AS n, round(sum(val), 2) AS sv
        FROM now GROUP BY grp
        UNION ALL
        SELECT 'tag', grp, count(*), round(sum(val), 2)
        FROM base GROUP BY grp
        ORDER BY side, grp""")),

    // ---- q156: DATASET CONTENT FINGERPRINT × TAGS — the training-
    // data reproducibility primitive. An order-invariant 60-bit
    // content hash (md5 → 15 hex chars → bit_xor fold; every piece
    // evaluates bit-identically in Spark AND DuckDB, which is exactly
    // what the cross-engine oracle proves) identifies "what the model
    // saw" with one shuffle-free aggregate — no row comparison, no
    // ordering, no layout assumptions. The 'tag' side computes it
    // directly over the pinned snapshot; the 'now' side comes from
    // the INCREMENTALLY MAINTAINED FingerprintStore: its watermark is
    // set right after the load, so the copy-on-write DELETE and
    // UPDATE reach it only through the change feed's sign-blind XOR
    // fold (touched files only, never the corpus) — a wrong fold
    // lands a wrong long and the cross-engine hash breaks.
    Q("q156_warehouse_snapshot_fingerprint",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q156-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true, // keep the feed consumable (class doc)
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("fp156_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").cast("decimal(12,2)").as("val"))
          .createOrReplaceTempView("fp156_src")
        s.sql("""CREATE TABLE fp156_t (
                   id BIGINT, grp STRING, val DECIMAL(12,2))""")
        s.sql("INSERT INTO fp156_t SELECT * FROM fp156_src")
        s.sql("ALTER TABLE fp156_t CREATE TAG v-data")
        val cols = Seq("id", "grp", "val")
        // baseline the store HERE: everything after folds incrementally
        graft.ext.FingerprintStore.refresh(wh, "t", cols)
        s.sql("DELETE FROM fp156_t WHERE id % 3 = 0")
        s.sql("UPDATE fp156_t SET val = val + 1 WHERE grp = 'F'")
        val fpTag = graft.ext.Fingerprint.dataset(
          wh.readTag("t", "v-data"), cols)
        val (fpNow, _) = graft.ext.FingerprintStore.refresh(wh, "t", cols)
        Seq(("now", fpNow), ("tag", fpTag)).toDF("side", "fp")
          .orderBy("side")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS val
          FROM orders),
        now AS (
          SELECT id, grp,
                 CASE WHEN grp = 'F' THEN val + 1 ELSE val END AS val
          FROM base WHERE id % 3 <> 0),
        key AS (
          SELECT CAST('0x' || substr(md5(concat_ws('|',
                   md5(coalesce(CAST(id AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(grp AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(val AS VARCHAR), chr(0))))), 1, 15)
                 AS BIGINT) AS k, 'now' AS side FROM now
          UNION ALL
          SELECT CAST('0x' || substr(md5(concat_ws('|',
                   md5(coalesce(CAST(id AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(grp AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(val AS VARCHAR), chr(0))))), 1, 15)
                 AS BIGINT), 'tag' FROM base)
        SELECT side, bit_xor(k) AS fp FROM key
        GROUP BY side ORDER BY side""")),

    // ---- q157: CHANGE FEED ACROSS RESTORE — the rollback-resurrection
    // case under the cross-engine gate. A δ-weighted aggregate is
    // baselined at a watermark, then the table takes a merge-on-read
    // DELETE, a RESTORE that UNDOES it, and a copy-on-write UPDATE;
    // the consumer folds ONLY the feed (never rescans). The feed must
    // emit the MoR delete as −1 retractions AND the restore as +1
    // resurrections (the DV-shrink case) or the fold nets wrong —
    // DuckDB recomputes the final state directly, so a missing
    // resurrection (or a double-counted one) breaks the hash.
    Q("q157_warehouse_cdf_restore",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q157-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true,
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("cdf157_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("cdf157_src")
        s.sql("CREATE TABLE cdf157_t (id BIGINT, grp STRING, val DOUBLE)")
        s.sql("INSERT INTO cdf157_t SELECT * FROM cdf157_src")
        val wm = wh.versions("t").max
        // baseline the consumer's state AT the watermark snapshot
        val state0 = wh.readVersion("t", wm).groupBy("grp")
          .agg(count(lit(1)).as("n"), sum(col("val")).as("sv"))
        // DML the consumer never sees directly:
        wh.deleteVectored("t", col("id") % 5 === 0) // MoR: −1 feed rows
        wh.restore("t", wm)                         // undo: +1 resurrections
        s.sql("UPDATE cdf157_t SET val = val * 2 WHERE grp = 'O'")
        // fold ONLY the feed into the baseline
        val feed = wh.readChangeFeed("t", wm, wh.versions("t").max)
        val delta = feed.groupBy("grp").agg(
          sum(col("_change_delta")).as("dn"),
          sum(col("val") * col("_change_delta")).as("dv"))
        state0.join(delta, Seq("grp"), "full_outer")
          .select(col("grp"),
            (coalesce(col("n"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n"),
            round(coalesce(col("sv"), lit(0.0)) +
              coalesce(col("dv"), lit(0.0)), 2).as("sv"))
          .where(col("n") > 0)
          .orderBy("grp")
      },
      Some("""
        WITH fin AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
                      ELSE o_totalprice END AS val
          FROM orders)
        SELECT grp, count(*) AS n, round(sum(val), 2) AS sv
        FROM fin GROUP BY grp ORDER BY grp""")),

    // ---- q158: WRITE-AUDIT-PUBLISH under the gate — the production
    // pattern for risky loads: stage corrections on a ZERO-COPY clone
    // (readers of the target see nothing), audit there (the cloned
    // CHECK constraint rejects a dirty batch — caught, nothing lands),
    // then PUBLISH fast-forwards the target in ONE metadata commit
    // referencing the audited files by borrow. The hash gates the
    // final target: a leaked staging write, a dirty-batch escape, or a
    // partial publish all break it against DuckDB's direct recompute.
    Q("q158_warehouse_wap",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q158-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("wap158_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("wap158_src")
        s.sql("CREATE TABLE wap158_t (id BIGINT, grp STRING, val DOUBLE)")
        s.sql("ALTER TABLE wap158_t ADD CONSTRAINT val_pos " +
          "CHECK (val >= 0)")
        s.sql("INSERT INTO wap158_t SELECT * FROM wap158_src")
        s.sql("CREATE TABLE wap158_stage SHALLOW CLONE wap158_t")
        s.sql("DELETE FROM wap158_stage WHERE id % 4 = 0")
        s.sql("""INSERT INTO wap158_stage
                 SELECT id + 100000000, 'FIX', val * 2
                 FROM wap158_src WHERE id % 4 = 0""")
        // the audit catches a dirty batch ON STAGING (cloned CHECK):
        // rejected whole, target never sees it
        val rejected =
          try {
            s.sql("""INSERT INTO wap158_stage
                     SELECT id + 200000000, 'BAD', -val
                     FROM wap158_src WHERE id % 50 = 0""")
            false
          } catch {
            case _: graft.pipeline.Warehouse.CheckViolation => true
          }
        require(rejected, "q158: the dirty staging batch must reject")
        s.sql("PUBLISH TABLE wap158_stage TO wap158_t")
        s.sql("""SELECT grp, CAST(count(*) AS BIGINT) AS n,
                        round(sum(val), 2) AS sv
                 FROM wap158_t GROUP BY grp ORDER BY grp""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 o_totalprice AS val
          FROM orders),
        fin AS (
          SELECT * FROM base WHERE id % 4 <> 0
          UNION ALL
          SELECT id + 100000000, 'FIX', val * 2
          FROM base WHERE id % 4 = 0)
        SELECT grp, count(*) AS n, round(sum(val), 2) AS sv
        FROM fin GROUP BY grp ORDER BY grp""")),

    // ---- q159: ENFORCED FOREIGN KEYs under the gate — referential
    // integrity as the reference's Postgres users know it. One
    // statement of each kind runs against the hash: a dangling INSERT
    // rejects WHOLE (its valid rows must not leak), a NULL key passes
    // (SQL MATCH SIMPLE), appendQuarantine routes danglers as
    // `foreign_key` rows (collisions keep their sharper `primary_key`
    // tag), a referenced parent key refuses to DELETE (ON DELETE
    // RESTRICT) while an unreferenced one goes. Scale shape: both
    // probe directions are file-skipped through the same footer-stat/
    // bloom machinery as the PK probe, so enforcement costs
    // batch-overlapping files, never the tables (WarehouseFkSpec
    // proves skipped files are never read by corrupting one).
    Q("q159_warehouse_foreign_key",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q159-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("fk159_")
        s.sql("""CREATE TABLE fk159_n (
                   nid BIGINT PRIMARY KEY, nname STRING
                 ) STATS BY (nid)""")
        s.sql("""CREATE TABLE fk159_c (
                   cid BIGINT PRIMARY KEY,
                   nk BIGINT REFERENCES fk159_n (nid),
                   bal DOUBLE
                 ) STATS BY (cid)""")
        t(s, dir, "nation").select(
            col("n_nationkey").cast("long").as("nid"),
            col("n_name").as("nname"))
          .where(col("nid") < 20)
          .createOrReplaceTempView("fk159_nsrc")
        val cust = t(s, dir, "customer").select(
            col("c_custkey").cast("long").as("cid"),
            col("c_nationkey").cast("long").as("nk"),
            col("c_acctbal").cast("double").as("bal"))
          .where(col("nk") < 20)
        cust.createOrReplaceTempView("fk159_csrc")
        s.sql("INSERT INTO fk159_n SELECT * FROM fk159_nsrc")
        s.sql("INSERT INTO fk159_c SELECT * FROM fk159_csrc")
        // dangling keys reject the WHOLE insert — the valid LEAK slice
        // must not land (the hash would catch it)
        val dangled =
          try {
            s.sql("""INSERT INTO fk159_c
                     SELECT cid + 300000000, nk, bal
                     FROM fk159_csrc WHERE cid % 11 = 0
                     UNION ALL
                     SELECT cid + 400000000, nk + 30, bal
                     FROM fk159_csrc WHERE cid % 17 = 0""")
            false
          } catch {
            case _: graft.pipeline.Warehouse.ForeignKeyViolation => true
          }
        require(dangled, "q159: the dangling INSERT must be rejected")
        // RESTRICT: a referenced parent refuses to die; an
        // unreferenced synthetic one deletes cleanly
        s.sql("INSERT INTO fk159_n VALUES (777, 'ZOMBIE')")
        s.sql("DELETE FROM fk159_n WHERE nid = 777")
        val restricted =
          try { s.sql("DELETE FROM fk159_n WHERE nid = 1"); false }
          catch {
            case _: graft.pipeline.Warehouse.ForeignKeyViolation => true
          }
        require(restricted, "q159: deleting a referenced key must fail")
        // quarantine: fresh valid rows + a NULL key KEEP; danglers tag
        // `foreign_key`; live-key collisions keep `primary_key`
        val mixed = cust.where(col("cid") % 10 === 0)
          .select((col("cid") + 1000000000L).as("cid"), col("nk"),
            col("bal"))
          .unionByName(cust.where(col("cid") % 13 === 0)
            .select((col("cid") + 2000000000L).as("cid"),
              (col("nk") + 30L).as("nk"), col("bal")))
          .unionByName(cust.where(col("cid") % 7 === 0))
          .unionByName(s.range(1).select(lit(-5L).as("cid"),
            lit(null).cast("long").as("nk"), lit(3.0).as("bal")))
        wh.appendQuarantine("c", "c_bad", mixed)
        wh.registerSql("fk159_")
        s.sql("""
          SELECT 'kept' AS side, coalesce(CAST(nk AS STRING), '~') AS k,
                 CAST(count(*) AS BIGINT) AS n, round(sum(bal), 2) AS sv
          FROM fk159_c GROUP BY nk
          UNION ALL
          SELECT 'parent' AS side, 'live' AS k,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(nid) AS DOUBLE) AS sv
          FROM fk159_n
          UNION ALL
          SELECT 'quar' AS side, violation AS k,
                 CAST(count(*) AS BIGINT) AS n, round(sum(bal), 2) AS sv
          FROM fk159_c_bad GROUP BY violation
          ORDER BY side, k""")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey AS cid, CAST(c_nationkey AS BIGINT) AS nk,
                 CAST(c_acctbal AS DOUBLE) AS bal
          FROM customer WHERE c_nationkey < 20),
        kept AS (
          SELECT cid, nk, bal FROM cust
          UNION ALL
          SELECT cid + 1000000000, nk, bal FROM cust WHERE cid % 10 = 0
          UNION ALL
          SELECT -5, NULL, 3.0),
        quar AS (
          SELECT 'foreign_key' AS violation, bal FROM cust
          WHERE cid % 13 = 0
          UNION ALL
          SELECT 'primary_key', bal FROM cust WHERE cid % 7 = 0)
        SELECT 'kept' AS side, coalesce(CAST(nk AS VARCHAR), '~') AS k,
               count(*) AS n, round(sum(bal), 2) AS sv
        FROM kept GROUP BY nk
        UNION ALL
        SELECT 'parent', 'live', count(*),
               CAST(sum(n_nationkey) AS DOUBLE)
        FROM nation WHERE n_nationkey < 20
        UNION ALL
        SELECT 'quar', violation, count(*), round(sum(bal), 2)
        FROM quar GROUP BY violation
        ORDER BY side, k""")),

    // ---- q160: GENERATED ALWAYS AS IDENTITY under the gate — the
    // training-data sample-id primitive. The engine assigns BIGINT ids
    // with a DISTRIBUTED rank (range-partition + per-partition offset
    // — never a one-partition window), deterministic under the
    // declared ORDER BY, so an independent engine can replay the whole
    // assignment as row_number() + running offsets — which is exactly
    // what the DuckDB oracle does. The hash gates three load-bearing
    // properties at once: batches continue the sequence exactly where
    // the last stopped, a DELETE burns its ids (the hwm ratchet rides
    // commit metadata, so no reuse), and copy-on-write rewrites carry
    // assigned ids through untouched.
    Q("q160_docs_identity_assignment",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q160-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("d" -> graft.pipeline.Warehouse.TableSpec(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("rid",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("did",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("nch",
                org.apache.spark.sql.types.LongType))),
            statColumns = Seq("did"),
            identity = Some(graft.pipeline.Warehouse.Identity("rid",
              orderBy = Seq("did"))))))
        wh.bootstrap()
        val docs = t(s, dir, "documents").select(
          col("doc_id").cast("long").as("did"),
          col("n_chars").cast("long").as("nch"))
        // three epoch loads in did-order slices, shuffled on the way in
        // (assignment must not depend on arrival layout)
        wh.append("d", docs.where(col("did") % 3 === 0).repartition(16))
        wh.append("d", docs.where(col("did") % 3 === 1).repartition(16))
        // burn a slice of ids mid-sequence: the next batch must NOT
        // reuse them (hwm rides commit metadata, not live max)
        wh.delete("d", col("did") % 5 === 0)
        wh.append("d", docs.where(col("did") % 3 === 2).repartition(16))
        // a CoW rewrite between reads must not disturb assigned ids
        wh.update("d", col("did") % 7 === 0,
          Map("nch" -> (col("nch") + 1000000L)))
        wh.read("d")
          .groupBy((col("rid") % 11L).as("b"))
          .agg(count(lit(1)).as("n"), sum(col("rid")).as("sum_rid"),
            sum(col("did")).as("sum_did"), sum(col("nch")).as("sum_nch"))
          .orderBy(col("b"))
      },
      Some("""
        WITH docs AS (
          SELECT doc_id AS did, n_chars AS nch FROM documents),
        b1 AS (
          SELECT did, nch, row_number() OVER (ORDER BY did) AS rid
          FROM docs WHERE did % 3 = 0),
        b2 AS (
          SELECT did, nch,
                 (SELECT count(*) FROM b1)
                   + row_number() OVER (ORDER BY did) AS rid
          FROM docs WHERE did % 3 = 1),
        b3 AS (
          SELECT did, nch,
                 (SELECT count(*) FROM b1) + (SELECT count(*) FROM b2)
                   + row_number() OVER (ORDER BY did) AS rid
          FROM docs WHERE did % 3 = 2),
        live AS (
          SELECT * FROM (
            SELECT * FROM b1 UNION ALL SELECT * FROM b2
            UNION ALL SELECT * FROM b3)
          WHERE did % 5 <> 0 OR did % 3 = 2),
        upd AS (
          SELECT rid, did,
                 CASE WHEN did % 7 = 0 THEN nch + 1000000 ELSE nch END
                   AS nch
          FROM live)
        SELECT rid % 11 AS b, count(*) AS n,
               CAST(sum(rid) AS BIGINT) AS sum_rid,
               CAST(sum(did) AS BIGINT) AS sum_did,
               CAST(sum(nch) AS BIGINT) AS sum_nch
        FROM upd GROUP BY 1 ORDER BY b""")),

    // ---- q161: TIME-SERIES REGULARIZATION under the gate — resample
    // onto an hourly grid, densify each key's own span (per-key
    // sequence(), never a global cross join), then the two classic
    // fills: LOCF and linear interpolation, both as PARTITIONED
    // running windows (no single-partition sort anywhere — the
    // telemetry-at-scale contract; TimeSeriesSpec pins the plan).
    // Determinism across engines: per-bucket means divide an EXACT
    // integer cent-sum, the interpolation expression is the same IEEE
    // shape on both sides, and the emitted sums integerize per slot
    // BEFORE summing — so the hash gates the fills value-for-value.
    Q("q161_events_gapfill_interpolate",
      (s, dir) => {
        import graft.ext.TimeSeries
        val ev = t(s, dir, "events").select(
          (col("user_id") % 50).as("g"), col("ts"), col("value"))
        val obs = TimeSeries.resample(ev, Seq("g"), "ts", 3600,
            Seq(sum(round(col("value") * 100).cast("long")).as("cv"),
              count(lit(1)).as("m")))
          .select(col("g"), col("bucket"),
            (col("cv").cast("double") / col("m") / lit(100.0)).as("v"))
        val filled = TimeSeries.gapFill(obs, Seq("g"), "bucket", 3600)
          .withColumn("vi", col("v"))
        val both = TimeSeries.interpolate(
          TimeSeries.locf(filled, Seq("g"), "bucket", Seq("v")),
          Seq("g"), "bucket", "vi")
        both.groupBy(col("g"))
          .agg(count(lit(1)).as("n_slots"),
            count(col("vi")).as("n_interp"),
            sum(round(col("v") * 10000).cast("long")).as("s_locf"),
            sum(round(col("vi") * 10000).cast("long")).as("s_interp"))
          .orderBy(col("g"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id % 50 AS g, ts, value FROM events),
        obs AS (
          SELECT g, CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS b,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                   / count(*) / 100.0 AS v
          FROM ev GROUP BY 1, 2),
        spans AS (SELECT g, min(b) AS lo, max(b) AS hi FROM obs GROUP BY g),
        grid AS (
          SELECT g, unnest(generate_series(lo, hi, 3600)) AS b FROM spans),
        filled AS (
          SELECT grid.g AS g, grid.b AS b, obs.v AS v
          FROM grid LEFT JOIN obs USING (g, b)),
        w AS (
          SELECT g, b, v,
            last_value(v IGNORE NULLS) OVER wp AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
              OVER wp AS pt,
            first_value(v IGNORE NULLS) OVER wf AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
              OVER wf AS nt
          FROM filled
          WINDOW wp AS (PARTITION BY g ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY g ORDER BY b
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        fin AS (
          SELECT g, b, pv AS vl,
            CASE WHEN v IS NOT NULL THEN v
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv + (nv - pv)
                   * (CAST(b AS DOUBLE) - CAST(pt AS DOUBLE))
                   / (CAST(nt AS DOUBLE) - CAST(pt AS DOUBLE))
            END AS vi
          FROM w)
        SELECT g, count(*) AS n_slots, count(vi) AS n_interp,
               CAST(sum(CAST(round(vl*10000) AS BIGINT)) AS BIGINT)
                 AS s_locf,
               CAST(sum(CAST(round(vi*10000) AS BIGINT)) AS BIGINT)
                 AS s_interp
        FROM fin GROUP BY g ORDER BY g""")),

    // ---- q162: PARTITION LAYOUT MIGRATION under the gate — ALTER
    // TABLE SET PARTITIONED BY rewrites the snapshot into the new
    // directory layout in ONE commit (the explicit-rewrite trade over
    // Iceberg's per-file specs — rationale in repartitionTable's
    // scaladoc). The hash gates content invariance through the
    // migration AND full DML function after it: the same rows must
    // come back from the new dirs, partition-pruned, after a
    // post-migration DELETE + UPDATE. A row lost/duplicated by the
    // rewrite, a misparsed partition value, or broken post-migration
    // DML all break the hash against DuckDB's layout-free replay.
    Q("q162_warehouse_repartition",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q162-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("rp162_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("rp162_src")
        s.sql("""CREATE TABLE rp162_t (
                   id BIGINT, grp STRING, val DOUBLE) STATS BY (id)""")
        s.sql("INSERT INTO rp162_t SELECT * FROM rp162_src")
        // migrate flat → partitioned by status, then keep operating
        s.sql("ALTER TABLE rp162_t SET PARTITIONED BY (grp)")
        s.sql("DELETE FROM rp162_t WHERE id % 3 = 0")
        s.sql("UPDATE rp162_t SET val = val * 2 WHERE grp = 'F'")
        s.sql("""SELECT grp, CAST(count(*) AS BIGINT) AS n,
                        round(sum(val), 2) AS sv,
                        CAST(sum(id) AS BIGINT) AS sid
                 FROM rp162_t GROUP BY grp ORDER BY grp""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 o_totalprice AS val
          FROM orders),
        fin AS (
          SELECT id, grp,
                 CASE WHEN grp = 'F' THEN val * 2 ELSE val END AS val
          FROM base WHERE id % 3 <> 0)
        SELECT grp, count(*) AS n, round(sum(val), 2) AS sv,
               CAST(sum(id) AS BIGINT) AS sid
        FROM fin GROUP BY grp ORDER BY grp""")),

    // ---- q163: SQL METADATA TABLES under the gate — `FROM wh_t.
    // partitions` / `.history` as join-able relations (Iceberg's
    // metadata-table shape). The load-bearing claim the hash gates:
    // the MANIFEST's per-partition row accounting (footer counts net
    // of deletion vectors, folded driver-side without touching a data
    // file) equals what the data actually holds — after an append, a
    // copy-on-write DELETE, and a merge-on-read vectored DELETE. A
    // stale footer count, a vector not netted out, or a misattributed
    // partition dir all break the compare against DuckDB's direct
    // data-side replay.
    Q("q163_warehouse_metadata_tables",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q163-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("grp",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("val",
                org.apache.spark.sql.types.DoubleType))),
            partitionBy = Seq("grp"),
            statColumns = Seq("id"))))
        wh.bootstrap()
        wh.registerSql("mt163_")
        wh.append("t", t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          col("o_orderstatus").as("grp"),
          col("o_totalprice").cast("double").as("val")))
        s.sql("DELETE FROM mt163_t WHERE id % 3 = 0") // copy-on-write
        wh.deleteVectored("t", col("id") % 7 === 0)   // merge-on-read
        s.sql("""
          SELECT 'part' AS side, partition AS k, rows AS n
          FROM mt163_t.partitions
          UNION ALL
          SELECT 'hist' AS side, operation AS k,
                 CAST(count(*) AS BIGINT) AS n
          FROM mt163_t.history
          WHERE operation IN ('append', 'delete')
          GROUP BY operation
          ORDER BY side, k""")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp FROM orders),
        live AS (
          SELECT * FROM base WHERE id % 3 <> 0 AND id % 7 <> 0)
        SELECT 'part' AS side, 'grp=' || grp AS k, count(*) AS n
        FROM live GROUP BY grp
        UNION ALL SELECT 'hist', 'append', 1
        UNION ALL SELECT 'hist', 'delete', 2
        ORDER BY side, k""")),

    // ---- q164: TYPE WIDENING under the gate — ALTER COLUMN c TYPE t
    // as a METADATA-ONLY schema change (Delta's type widening): the
    // narrow files written before the ALTER are never rewritten; the
    // scan upcasts them natively, and footer stats are long-encoded so
    // skipping survives the boundary (WarehouseWidenSpec corrupts a
    // pre-widening file behind its stats to prove it). The hash gates
    // value preservation through the boundary: INT rows and FLOAT rows
    // loaded before the widening must aggregate bit-consistently with
    // BIGINT/DOUBLE rows loaded after — DuckDB replays both eras with
    // explicit casts.
    Q("q164_lineitem_type_widening",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q164-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("wd164_")
        s.sql("""CREATE TABLE wd164_t (
                   ok BIGINT, qty INT, price FLOAT, flag STRING
                 ) STATS BY (ok)""")
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey").cast("long").as("ok"),
          col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag").as("flag"))
        // era 1: narrow INT/FLOAT rows
        wh.append("t", li.where(col("ok") % 2 === 0).select(col("ok"),
          col("l_quantity").cast("int").as("qty"),
          col("l_extendedprice").cast("float").as("price"), col("flag")))
        s.sql("ALTER TABLE wd164_t ALTER COLUMN qty TYPE BIGINT")
        s.sql("ALTER TABLE wd164_t ALTER COLUMN price TYPE DOUBLE")
        // era 2: values only the widened types can hold
        wh.append("t", li.where(col("ok") % 2 === 1).select(col("ok"),
          (col("l_quantity").cast("long") + 3000000000L).as("qty"),
          col("l_extendedprice").cast("double").as("price"), col("flag")))
        s.sql("""SELECT flag, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(qty) AS BIGINT) AS s_qty,
                        round(sum(price), 2) AS sv
                 FROM wd164_t GROUP BY flag ORDER BY flag""")
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS ok, l_quantity, l_extendedprice,
                 l_returnflag AS flag
          FROM lineitem),
        a AS (
          SELECT CAST(CAST(l_quantity AS INT) AS BIGINT) AS qty,
                 CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE) AS price,
                 flag
          FROM li WHERE ok % 2 = 0),
        b AS (
          SELECT CAST(l_quantity AS BIGINT) + 3000000000 AS qty,
                 CAST(l_extendedprice AS DOUBLE) AS price, flag
          FROM li WHERE ok % 2 = 1),
        u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        SELECT flag, count(*) AS n, CAST(sum(qty) AS BIGINT) AS s_qty,
               round(sum(price), 2) AS sv
        FROM u GROUP BY flag ORDER BY flag""")),

    // ---- q165: UNIQUE + DEFAULT under the gate — the rest of the SQL
    // constraint surface around the enforced PK/FK. One statement of
    // each kind runs against the hash: a column-list INSERT omitting
    // the DEFAULTed column (the fill must land for every row), a
    // unique-stealing INSERT rejecting WHOLE (its fresh rows must not
    // leak), and a quarantine split routing stolen values as `unique`
    // rows while PK collisions keep their sharper `primary_key` tag.
    // The unique probe file-skips through the same keyProbeScope as
    // the PK/FK probes (WarehouseUniqueSpec).
    Q("q165_warehouse_unique_default",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q165-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("uq165_")
        s.sql("""CREATE TABLE uq165_t (
                   id BIGINT PRIMARY KEY,
                   ref STRING UNIQUE,
                   seg STRING DEFAULT 'unassigned',
                   bal DOUBLE
                 ) STATS BY (id)""")
        t(s, dir, "customer").select(
            col("c_custkey").cast("long").as("id"),
            concat(lit("r"), col("c_custkey")).as("ref"),
            col("c_acctbal").cast("double").as("bal"))
          .createOrReplaceTempView("uq165_src")
        // column-list INSERT omitting the DEFAULTed seg
        s.sql("""INSERT INTO uq165_t (id, ref, bal)
                 SELECT id, ref, bal FROM uq165_src""")
        // stealing live refs rejects WHOLE — the fresh half must not leak
        val stole =
          try {
            s.sql("""INSERT INTO uq165_t (id, ref, bal)
                     SELECT id + 500000000, concat('f', id), bal
                     FROM uq165_src WHERE id % 19 = 0
                     UNION ALL
                     SELECT id + 600000000, ref, bal
                     FROM uq165_src WHERE id % 9 = 0""")
            false
          } catch {
            case _: graft.pipeline.Warehouse.UniqueViolation => true
          }
        require(stole, "q165: the ref-stealing INSERT must be rejected")
        // quarantine: fresh refs keep (DEFAULT fills seg), stolen refs
        // tag `unique`, live-id collisions keep `primary_key`
        val cust = s.table("uq165_src")
        val mixed = cust.where(col("id") % 10 === 0)
          .select((col("id") + 1000000000L).as("id"),
            concat(lit("n"), col("id")).as("ref"),
            lit("new").as("seg"), col("bal"))
          .unionByName(cust.where(col("id") % 13 === 0)
            .select((col("id") + 2000000000L).as("id"), col("ref"),
              lit("steal").as("seg"), col("bal")))
          .unionByName(cust.where(col("id") % 7 === 0)
            .select(col("id"), concat(lit("c"), col("id")).as("ref"),
              lit("coll").as("seg"), col("bal")))
        wh.appendQuarantine("t", "t_bad", mixed)
        wh.registerSql("uq165_")
        s.sql("""
          SELECT 'kept' AS side, seg AS k, CAST(count(*) AS BIGINT) AS n,
                 round(sum(bal), 2) AS sv
          FROM uq165_t GROUP BY seg
          UNION ALL
          SELECT 'quar' AS side, violation AS k,
                 CAST(count(*) AS BIGINT) AS n, round(sum(bal), 2) AS sv
          FROM uq165_t_bad GROUP BY violation
          ORDER BY side, k""")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey AS id, 'r' || c_custkey AS ref,
                 CAST(c_acctbal AS DOUBLE) AS bal
          FROM customer),
        kept AS (
          SELECT 'unassigned' AS seg, bal FROM cust
          UNION ALL
          SELECT 'new', bal FROM cust WHERE id % 10 = 0),
        quar AS (
          SELECT 'unique' AS violation, bal FROM cust WHERE id % 13 = 0
          UNION ALL
          SELECT 'primary_key', bal FROM cust WHERE id % 7 = 0)
        SELECT 'kept' AS side, seg AS k, count(*) AS n,
               round(sum(bal), 2) AS sv
        FROM kept GROUP BY seg
        UNION ALL
        SELECT 'quar', violation, count(*), round(sum(bal), 2)
        FROM quar GROUP BY violation
        ORDER BY side, k""")),

    // ---- q166: ALTER-TIME CONSTRAINT DDL under the gate — the
    // migration story: an EXISTING loaded table takes UNIQUE / FOREIGN
    // KEY / DEFAULT without recreation. The hash gates the
    // validate-then-persist contract end-to-end: an ADD UNIQUE over
    // dirty data refuses AND does not stick (later inserts with
    // duplicate statuses must land), an ADD FOREIGN KEY over satisfied
    // data starts enforcing immediately (the dangling INSERT after it
    // must reject whole), and a SET DEFAULT fills from that statement
    // on. A constraint that half-sticks, fails open, or back-fills
    // breaks the compare against DuckDB's plain replay.
    Q("q166_warehouse_alter_constraints",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q166-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("alt166_")
        s.sql("""CREATE TABLE alt166_cust (
                   ck BIGINT PRIMARY KEY) STATS BY (ck)""")
        s.sql("""CREATE TABLE alt166_o (
                   oid BIGINT PRIMARY KEY, ck BIGINT, st STRING,
                   pri STRING) STATS BY (oid)""")
        t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("ck"))
          .createOrReplaceTempView("alt166_csrc")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_custkey").cast("long").as("ck"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("pri"))
          .createOrReplaceTempView("alt166_osrc")
        s.sql("INSERT INTO alt166_cust SELECT * FROM alt166_csrc")
        s.sql("INSERT INTO alt166_o SELECT * FROM alt166_osrc")
        // ADD UNIQUE over a dirty column refuses — and must NOT stick
        val dirty =
          try { s.sql("ALTER TABLE alt166_o ADD UNIQUE (st)"); false }
          catch {
            case _: graft.pipeline.Warehouse.UniqueViolation => true
          }
        require(dirty, "q166: ADD UNIQUE over duplicate statuses must fail")
        // every order's customer exists → the FK takes, then enforces
        s.sql("ALTER TABLE alt166_o ADD FOREIGN KEY (ck) " +
          "REFERENCES alt166_cust (ck)")
        val dangled =
          try {
            s.sql("""INSERT INTO alt166_o
                     SELECT oid + 700000000, ck + 900000000, st, pri
                     FROM alt166_osrc WHERE oid % 21 = 0""")
            false
          } catch {
            case _: graft.pipeline.Warehouse.ForeignKeyViolation => true
          }
        require(dangled, "q166: the post-ALTER dangling INSERT must fail")
        // SET DEFAULT fills from now on (duplicate statuses still land —
        // the refused UNIQUE must not have stuck)
        s.sql("ALTER TABLE alt166_o ALTER COLUMN pri SET DEFAULT 'none'")
        s.sql("""INSERT INTO alt166_o (oid, ck, st)
                 SELECT oid + 800000000, ck, st
                 FROM alt166_osrc WHERE oid % 17 = 0""")
        s.sql("""SELECT st, pri, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(oid) AS BIGINT) AS soid
                 FROM alt166_o GROUP BY st, pri ORDER BY st, pri""")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey AS oid, o_orderstatus AS st,
                 o_orderpriority AS pri
          FROM orders),
        fin AS (
          SELECT oid, st, pri FROM o
          UNION ALL
          SELECT oid + 800000000, st, 'none' FROM o WHERE oid % 17 = 0)
        SELECT st, pri, count(*) AS n, CAST(sum(oid) AS BIGINT) AS soid
        FROM fin GROUP BY st, pri ORDER BY st, pri""")),

    // ---- q167: CONSTRAINT DROP DDL under the gate — the UNDO half of
    // q166's migration story (ALTER ... DROP UNIQUE / FOREIGN KEY /
    // PRIMARY KEY). The hash gates the full add → enforce → drop →
    // formerly-violating-INSERT-lands cycle for UNIQUE and FK, plus the
    // RESTRICT contract on the PK side: DROP PRIMARY KEY refuses while
    // an FK references it and succeeds once the FK is dropped — after
    // which a duplicate-key INSERT into the ex-parent must land (the
    // probe really stopped). A drop that fails closed (keeps
    // enforcing), fails open early, or half-persists diverges from
    // DuckDB's replay of exactly the surviving rows.
    Q("q167_warehouse_drop_constraints",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q167-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("drp167_")
        s.sql("""CREATE TABLE drp167_cust (
                   ck BIGINT PRIMARY KEY) STATS BY (ck)""")
        s.sql("""CREATE TABLE drp167_o (
                   oid BIGINT PRIMARY KEY, ck BIGINT, ref STRING,
                   st STRING) STATS BY (oid)""")
        t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("ck"))
          .createOrReplaceTempView("drp167_csrc")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_custkey").cast("long").as("ck"),
            concat(lit("r"), col("o_orderkey")).as("ref"),
            col("o_orderstatus").as("st"))
          .createOrReplaceTempView("drp167_osrc")
        s.sql("INSERT INTO drp167_cust SELECT * FROM drp167_csrc")
        s.sql("INSERT INTO drp167_o SELECT * FROM drp167_osrc")
        // UNIQUE: add (clean refs → sticks), enforce, drop, re-insert
        s.sql("ALTER TABLE drp167_o ADD UNIQUE (ref)")
        val stealSql = """INSERT INTO drp167_o
                          SELECT oid + 100000000, ck, ref, st
                          FROM drp167_osrc WHERE oid % 13 = 0"""
        val stole =
          try { s.sql(stealSql); false }
          catch {
            case _: graft.pipeline.Warehouse.UniqueViolation => true
          }
        require(stole, "q167: the ref-stealing INSERT must be rejected")
        s.sql("ALTER TABLE drp167_o DROP UNIQUE (ref)")
        s.sql(stealSql) // the formerly-violating statement now lands
        // FK: add (every ck has a parent), enforce, PK-drop refusal,
        // FK drop, re-insert
        s.sql("ALTER TABLE drp167_o ADD FOREIGN KEY (ck) " +
          "REFERENCES drp167_cust (ck)")
        val dangleSql = """INSERT INTO drp167_o
                           SELECT oid + 200000000, ck + 900000000,
                                  concat('d', oid), st
                           FROM drp167_osrc WHERE oid % 21 = 0"""
        val dangled =
          try { s.sql(dangleSql); false }
          catch {
            case _: graft.pipeline.Warehouse.ForeignKeyViolation => true
          }
        require(dangled, "q167: the dangling INSERT must be rejected")
        val pkHeld =
          try { s.sql("ALTER TABLE drp167_cust DROP PRIMARY KEY"); false }
          catch { case e: Exception
              if e.getMessage.contains("FOREIGN KEY") => true }
        require(pkHeld,
          "q167: DROP PRIMARY KEY must refuse while the FK references it")
        s.sql("ALTER TABLE drp167_o DROP FOREIGN KEY (ck)")
        s.sql(dangleSql) // dangling rows land once the FK is gone
        // PK: drop now succeeds, and duplicate keys land in the
        // ex-parent (the collision probe really stopped)
        s.sql("ALTER TABLE drp167_cust DROP PRIMARY KEY")
        s.sql("""INSERT INTO drp167_cust
                 SELECT ck FROM drp167_csrc WHERE ck % 11 = 0""")
        s.sql("""
          SELECT side, n, sv FROM (
            SELECT 'o' AS side, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(oid) AS BIGINT) AS sv
            FROM drp167_o
            UNION ALL
            SELECT 'cust' AS side, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ck) AS BIGINT) AS sv
            FROM drp167_cust)
          ORDER BY side""")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey AS oid, o_custkey AS ck FROM orders),
        c AS (SELECT c_custkey AS ck FROM customer),
        o_fin AS (
          SELECT oid FROM o
          UNION ALL
          SELECT oid + 100000000 FROM o WHERE oid % 13 = 0
          UNION ALL
          SELECT oid + 200000000 FROM o WHERE oid % 21 = 0),
        c_fin AS (
          SELECT ck FROM c
          UNION ALL
          SELECT ck FROM c WHERE ck % 11 = 0)
        SELECT side, n, sv FROM (
          SELECT 'o' AS side, count(*) AS n, CAST(sum(oid) AS BIGINT) AS sv
          FROM o_fin
          UNION ALL
          SELECT 'cust' AS side, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sv
          FROM c_fin) x
        ORDER BY side""")),

    // ---- q168: WEIGHTED (multiplicity-aware) CONTENT FINGERPRINT —
    // q156's XOR fold cancels even-multiplicity rows by design; the
    // sum-mod-2^60 variant weighs them. A duplicate-bearing corpus
    // (every id%7 row inserted TWICE) distinguishes the two modes under
    // the cross-engine hash: the XOR fingerprint is IDENTICAL before
    // and after deleting both copies of every duplicated row (parity-
    // blind), while the weighted one moves — and the post-delete
    // weighted value comes from the incrementally maintained store's
    // SIGNED feed fold (Σ key·δ masked to 60 bits), never a rescan.
    // The overflow argument is itself under test: DuckDB sums into
    // HUGEINT and reduces % 2^60 exactly; Spark's wrapped long sum
    // masks to the same residue because 2^60 divides 2^64.
    Q("q168_docs_weighted_fingerprint",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q168-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true,
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("fpw168_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("id"),
            col("o_orderstatus").as("grp"),
            col("o_totalprice").cast("decimal(12,2)").as("val"))
          .createOrReplaceTempView("fpw168_src")
        s.sql("""CREATE TABLE fpw168_t (
                   id BIGINT, grp STRING, val DECIMAL(12,2))""")
        s.sql("INSERT INTO fpw168_t SELECT * FROM fpw168_src")
        s.sql("""INSERT INTO fpw168_t
                 SELECT * FROM fpw168_src WHERE id % 7 = 0""")
        val cols = Seq("id", "grp", "val")
        val fpXorDup = graft.ext.Fingerprint.dataset(wh.read("t"), cols)
        // baseline the WEIGHTED store here: the delete below reaches it
        // only through the signed change-feed fold
        val (fpWDup, _) = graft.ext.FingerprintStore.refresh(
          wh, "t", cols, weighted = true)
        s.sql("DELETE FROM fpw168_t WHERE id % 7 = 0")
        val fpXorPost = graft.ext.Fingerprint.dataset(wh.read("t"), cols)
        val (fpWPost, _) = graft.ext.FingerprintStore.refresh(
          wh, "t", cols, weighted = true)
        require(fpXorDup == fpXorPost,
          "q168: XOR must be blind to removing even-multiplicity rows")
        require(fpWDup != fpWPost,
          "q168: the weighted fold must see the multiplicity change")
        Seq(("w", "dup", fpWDup), ("w", "post", fpWPost),
            ("x", "dup", fpXorDup), ("x", "post", fpXorPost))
          .toDF("mode", "phase", "fp").orderBy("mode", "phase")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS id, o_orderstatus AS grp,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS val
          FROM orders),
        dupd AS (
          SELECT * FROM base
          UNION ALL SELECT * FROM base WHERE id % 7 = 0),
        post AS (SELECT * FROM base WHERE id % 7 <> 0),
        key AS (
          SELECT CAST('0x' || substr(md5(concat_ws('|',
                   md5(coalesce(CAST(id AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(grp AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(val AS VARCHAR), chr(0))))), 1, 15)
                 AS BIGINT) AS k, 'dup' AS phase FROM dupd
          UNION ALL
          SELECT CAST('0x' || substr(md5(concat_ws('|',
                   md5(coalesce(CAST(id AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(grp AS VARCHAR), chr(0))),
                   md5(coalesce(CAST(val AS VARCHAR), chr(0))))), 1, 15)
                 AS BIGINT), 'post' FROM post)
        SELECT mode, phase, fp FROM (
          SELECT 'w' AS mode, phase,
                 CAST(sum(k) % 1152921504606846976 AS BIGINT) AS fp
          FROM key GROUP BY phase
          UNION ALL
          SELECT 'x' AS mode, phase, bit_xor(k) AS fp
          FROM key GROUP BY phase) z
        ORDER BY mode, phase""")),

    // ---- q169: CONSUMERS ACROSS A LAYOUT MIGRATION under the gate —
    // the era-split re-anchor end to end: a δ-fold consumer baselines
    // at a watermark, the table takes a copy-on-write DELETE, an
    // `ALTER TABLE SET PARTITIONED BY` migration (a full rewrite), and
    // a post-migration INSERT; the consumer folds ONLY the feed. The
    // feed must read the pre-migration era under the OLD layout, emit
    // ZERO for the rewrite (content identity), and the new era's
    // appends under the NEW layout — a missed era, a double-counted
    // rewrite, or a misparsed directory breaks the hash against
    // DuckDB's direct replay. The metadata relation proves the new
    // layout is real: per-partition NET row counts from `t.partitions`
    // equal a data-side GROUP BY that DuckDB replays.
    Q("q169_warehouse_migration_era_feed",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q169-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true, // pre-migration era must stay readable
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("mig169_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_orderstatus").as("st"),
            col("o_totalprice").cast("double").as("price"))
          .createOrReplaceTempView("mig169_src")
        s.sql("""CREATE TABLE mig169_t (
                   oid BIGINT, st STRING, price DOUBLE) STATS BY (oid)""")
        s.sql("INSERT INTO mig169_t SELECT * FROM mig169_src")
        val wm = wh.versions("t").max
        val state0 = wh.readVersion("t", wm).groupBy("st")
          .agg(count(lit(1)).as("n0"), sum(col("price")).as("s0"))
        // DML the consumer never sees directly — on BOTH sides of the
        // migration, plus the rewrite itself in between
        s.sql("DELETE FROM mig169_t WHERE oid % 4 = 0")
        s.sql("ALTER TABLE mig169_t SET PARTITIONED BY (st)")
        s.sql("""INSERT INTO mig169_t
                 SELECT oid + 900000000, st, price
                 FROM mig169_src WHERE oid % 9 = 0""")
        val feed = wh.readChangeFeed("t", wm)
        val delta = feed.groupBy("st").agg(
          sum(col("_change_delta")).as("dn"),
          sum(col("price") * col("_change_delta")).as("ds"))
        val fold = state0.join(delta, Seq("st"), "full_outer")
          .select(lit("fold").as("side"), col("st").as("k"),
            (coalesce(col("n0"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n"),
            round(coalesce(col("s0"), lit(0.0)) +
              coalesce(col("ds"), lit(0.0)), 2).as("sv"))
          .where(col("n") > 0)
        val meta = s.sql(
          """SELECT 'meta' AS side, partition AS k,
                    CAST(rows AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS sv
             FROM mig169_t.partitions""")
        fold.unionByName(meta).orderBy("side", "k")
      },
      Some("""
        WITH fin AS (
          SELECT o_orderkey AS oid, o_orderstatus AS st,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders WHERE o_orderkey % 4 <> 0
          UNION ALL
          SELECT o_orderkey + 900000000, o_orderstatus,
                 CAST(o_totalprice AS DOUBLE)
          FROM orders WHERE o_orderkey % 9 = 0)
        SELECT side, k, n, sv FROM (
          SELECT 'fold' AS side, st AS k, count(*) AS n,
                 round(sum(price), 2) AS sv
          FROM fin GROUP BY st
          UNION ALL
          SELECT 'meta', 'st=' || st, count(*),
                 CAST(NULL AS DOUBLE)
          FROM fin GROUP BY st) z
        ORDER BY side, k""")),

    // ---- q170: RESTORE ACROSS A LAYOUT MIGRATION under the gate —
    // round-11's closure of the one read-path asymmetry: a table takes
    // pre-migration DML, an `ALTER TABLE SET PARTITIONED BY` rewrite,
    // a post-migration INSERT, then `RESTORE TO VERSION AS OF` a
    // PRE-migration version (the layout flips back in the same
    // commit), then post-restore DML under the restored layout. Four
    // gated sides: the final state itself; a δ-fold consumer whose
    // watermark PRE-dates everything (its feed must read the rewrite
    // as zero, the restore hop as its TRUE rollback diff with each
    // side under its own era's layout, and both inserts exactly — a
    // wrong hop breaks the hash); the middle (migrated) era's time
    // travel, re-anchored THROUGH the restore commit's stamp; and the
    // versioned metadata relation (`t.partitions VERSION AS OF`) whose
    // per-partition counts DuckDB replays from data.
    Q("q170_warehouse_restore_across_migration",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q170-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true, // restore + feeds need the old eras
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("mig170_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_orderstatus").as("st"),
            col("o_totalprice").cast("double").as("price"))
          .createOrReplaceTempView("mig170_src")
        s.sql("""CREATE TABLE mig170_t (
                   oid BIGINT, st STRING, price DOUBLE) STATS BY (oid)""")
        s.sql("INSERT INTO mig170_t SELECT * FROM mig170_src")
        val wm = wh.versions("t").max
        val state0 = wh.readVersion("t", wm).groupBy("st")
          .agg(count(lit(1)).as("n0"), sum(col("price")).as("s0"))
        s.sql("DELETE FROM mig170_t WHERE oid % 5 = 0")
        val preV = wh.versions("t").max // flat era: src minus the %5s
        s.sql("ALTER TABLE mig170_t SET PARTITIONED BY (st)")
        s.sql("""INSERT INTO mig170_t
                 SELECT oid + 900000000, st, price
                 FROM mig170_src WHERE oid % 11 = 0""")
        val midV = wh.versions("t").max // migrated era, extra %11 rows
        s.sql(s"RESTORE TABLE mig170_t TO VERSION AS OF $preV")
        require(wh.tableSpec("t").partitionBy.isEmpty,
          "q170: the restore must flip the layout back to flat")
        s.sql("""INSERT INTO mig170_t
                 SELECT oid + 500000000, st, price
                 FROM mig170_src WHERE oid % 13 = 0""")
        val state = wh.read("t").groupBy("st")
          .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("sv"))
          .select(lit("state").as("side"), col("st").as("k"),
            col("n"), col("sv"))
        val feed = wh.readChangeFeed("t", wm)
        val delta = feed.groupBy("st").agg(
          sum(col("_change_delta")).as("dn"),
          sum(col("price") * col("_change_delta")).as("ds"))
        val fold = state0.join(delta, Seq("st"), "full_outer")
          .select(lit("fold").as("side"), col("st").as("k"),
            (coalesce(col("n0"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n"),
            round(coalesce(col("s0"), lit(0.0)) +
              coalesce(col("ds"), lit(0.0)), 2).as("sv"))
          .where(col("n") > 0)
        val mid = wh.readVersion("t", midV).groupBy("st")
          .agg(count(lit(1)).as("n"))
          .select(lit("mid").as("side"), col("st").as("k"),
            col("n"), lit(null).cast("double").as("sv"))
        val metav = s.sql(
          s"""SELECT 'metav' AS side, partition AS k,
                     CAST(rows AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS sv
              FROM mig170_t.partitions VERSION AS OF $midV""")
        state.unionByName(fold).unionByName(mid).unionByName(metav)
          .orderBy("side", "k")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS oid, o_orderstatus AS st,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders),
        pre AS (SELECT * FROM src WHERE oid % 5 <> 0),
        mid AS (
          SELECT * FROM pre
          UNION ALL
          SELECT oid + 900000000, st, price FROM src WHERE oid % 11 = 0),
        fin AS (
          SELECT * FROM pre
          UNION ALL
          SELECT oid + 500000000, st, price FROM src WHERE oid % 13 = 0)
        SELECT side, k, n, sv FROM (
          SELECT 'state' AS side, st AS k, count(*) AS n,
                 round(sum(price), 2) AS sv
          FROM fin GROUP BY st
          UNION ALL
          SELECT 'fold', st, count(*), round(sum(price), 2)
          FROM fin GROUP BY st
          UNION ALL
          SELECT 'mid', st, count(*), CAST(NULL AS DOUBLE)
          FROM mid GROUP BY st
          UNION ALL
          SELECT 'metav', 'st=' || st, count(*), CAST(NULL AS DOUBLE)
          FROM mid GROUP BY st) z
        ORDER BY side, k""")),

    // ---- q171: TAGS ACROSS A LAYOUT MIGRATION under the gate —
    // round-12's closure of the last migration asymmetry: a tagged
    // (flat-era) snapshot rides through `ALTER TABLE SET PARTITIONED
    // BY`, reads THROUGH the boundary under its own era's layout
    // (`VERSION AS OF '<tag>'` → readTag → layoutAtVersion), anchors a
    // cross-layout `RESTORE ... TO VERSION AS OF '<tag>'`, and still
    // reads after the restore flipped the layout back. Four gated
    // sides: the tag read post-migration; the tag re-read post-restore
    // (identical content — a broken era resolution breaks the hash);
    // the middle (partitioned) era's time travel re-anchored through
    // the restore stamp; and the final state after post-restore DML.
    Q("q171_warehouse_tags_across_migration",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q171-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true, // the tag + middle era need their files
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("tag171_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_orderstatus").as("st"),
            col("o_totalprice").cast("double").as("price"))
          .createOrReplaceTempView("tag171_src")
        s.sql("""CREATE TABLE tag171_t (
                   oid BIGINT, st STRING, price DOUBLE) STATS BY (oid)""")
        s.sql("INSERT INTO tag171_t SELECT * FROM tag171_src")
        s.sql("DELETE FROM tag171_t WHERE oid % 7 = 0")
        s.sql("ALTER TABLE tag171_t CREATE TAG pre-mig") // pins flat era
        s.sql("ALTER TABLE tag171_t SET PARTITIONED BY (st)")
        s.sql("""INSERT INTO tag171_t
                 SELECT oid + 900000000, st, price
                 FROM tag171_src WHERE oid % 11 = 0""")
        val midV = wh.versions("t").max // partitioned era
        // the tag reads through the migration, under the FLAT era
        val tagSide = s.sql(
          """SELECT 'tag' AS side, st AS k, count(*) AS n,
                    round(sum(price), 2) AS sv
             FROM tag171_t VERSION AS OF 'pre-mig' GROUP BY st""")
        // cross-layout restore ANCHORED BY THE TAG (the layout flips
        // back to flat in the same commit)
        s.sql("RESTORE TABLE tag171_t TO VERSION AS OF 'pre-mig'")
        require(wh.tableSpec("t").partitionBy.isEmpty,
          "q171: the tag-anchored restore must flip the layout to flat")
        s.sql("""INSERT INTO tag171_t
                 SELECT oid + 500000000, st, price
                 FROM tag171_src WHERE oid % 13 = 0""")
        // the tag STILL reads after the restore flipped layouts again
        val tag2 = s.sql(
          """SELECT 'tag2' AS side, st AS k, count(*) AS n,
                    round(sum(price), 2) AS sv
             FROM tag171_t VERSION AS OF 'pre-mig' GROUP BY st""")
        // the middle (partitioned) era re-anchors through the restore
        // commit's partitionByOld stamp
        val mid = wh.readVersion("t", midV).groupBy("st")
          .agg(count(lit(1)).as("n"))
          .select(lit("mid").as("side"), col("st").as("k"),
            col("n"), lit(null).cast("double").as("sv"))
        val state = s.sql(
          """SELECT 'state' AS side, st AS k, count(*) AS n,
                    round(sum(price), 2) AS sv
             FROM tag171_t GROUP BY st""")
        tagSide.unionByName(tag2).unionByName(mid).unionByName(state)
          .orderBy("side", "k")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS oid, o_orderstatus AS st,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders),
        pre AS (SELECT * FROM src WHERE oid % 7 <> 0),
        mid AS (
          SELECT * FROM pre
          UNION ALL
          SELECT oid + 900000000, st, price FROM src WHERE oid % 11 = 0),
        fin AS (
          SELECT * FROM pre
          UNION ALL
          SELECT oid + 500000000, st, price FROM src WHERE oid % 13 = 0)
        SELECT side, k, n, sv FROM (
          SELECT 'tag' AS side, st AS k, count(*) AS n,
                 round(sum(price), 2) AS sv
          FROM pre GROUP BY st
          UNION ALL
          SELECT 'tag2', st, count(*), round(sum(price), 2)
          FROM pre GROUP BY st
          UNION ALL
          SELECT 'mid', st, count(*), CAST(NULL AS DOUBLE)
          FROM mid GROUP BY st
          UNION ALL
          SELECT 'state', st, count(*), round(sum(price), 2)
          FROM fin GROUP BY st) z
        ORDER BY side, k""")),

    // ---- q172: WRITE-AUDIT-PUBLISH WITH REBASE under the gate —
    // the Iceberg WAP cherry-pick shape: ingest keeps appending to the
    // target while a long audit runs on a shallow-clone staging table,
    // then ONE publish commit lands the audited state PLUS the interim
    // appends (metadata only — no byte moves, base-file touches would
    // conflict). Three gated sides: the audited staging view ('stage'),
    // the pre-publish target head via time travel ('mid' — base +
    // interim, proving the audit never saw the interim rows and vice
    // versa), and the published merge ('state').
    Q("q172_warehouse_wap_rebase",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q172-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          retainReplaced = true, // 'mid' time-travels the parent head
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("wap172_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_orderstatus").as("st"),
            col("o_totalprice").cast("double").as("price"))
          .createOrReplaceTempView("wap172_src")
        s.sql("""CREATE TABLE wap172_t (
                   oid BIGINT, st STRING, price DOUBLE) STATS BY (oid)""")
        s.sql("INSERT INTO wap172_t SELECT * FROM wap172_src")
        s.sql("DELETE FROM wap172_t WHERE oid % 7 = 0") // audit base
        s.sql("CREATE TABLE wap172_stage SHALLOW CLONE wap172_t")
        // the audit's corrections land on staging (CoW rewrites +
        // fresh rows) — the target is untouched by them
        s.sql("DELETE FROM wap172_stage WHERE oid % 5 = 0")
        s.sql("""INSERT INTO wap172_stage
                 SELECT oid + 900000000, st, price
                 FROM wap172_src WHERE oid % 11 = 0""")
        // ingest continues on the TARGET while the audit runs (blind
        // appends — exactly what the rebase merges over)
        s.sql("""INSERT INTO wap172_t
                 SELECT oid + 500000000, st, price
                 FROM wap172_src WHERE oid % 13 = 0""")
        val midV = wh.versions("t").max // pre-publish parent head
        val stageSide = s.sql(
          """SELECT 'stage' AS side, st AS k, count(*) AS n,
                    round(sum(price), 2) AS sv
             FROM wap172_stage GROUP BY st""")
        // exact-base publish refuses (stale audit), the rebase lands
        val refused = // Spark may wrap the command's require
          try { s.sql("PUBLISH TABLE wap172_stage TO wap172_t"); false }
          catch { case scala.util.control.NonFatal(e) =>
            e.getMessage != null && e.getMessage.contains("rebase") }
        require(refused,
          "q172: the stale-audit publish must refuse with the rebase hint")
        s.sql("PUBLISH TABLE wap172_stage TO wap172_t WITH REBASE")
        require(wh.history("t").last._2("op") == "publish_rebase",
          "q172: history must record the rebase")
        val mid = wh.readVersion("t", midV).groupBy("st")
          .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("sv"))
          .select(lit("mid").as("side"), col("st").as("k"),
            col("n"), col("sv"))
        val state = s.sql(
          """SELECT 'state' AS side, st AS k, count(*) AS n,
                    round(sum(price), 2) AS sv
             FROM wap172_t GROUP BY st""")
        stageSide.unionByName(mid).unionByName(state)
          .orderBy("side", "k")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS oid, o_orderstatus AS st,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders),
        pre AS (SELECT * FROM src WHERE oid % 7 <> 0),
        staged AS (
          SELECT * FROM pre WHERE oid % 5 <> 0
          UNION ALL
          SELECT oid + 900000000, st, price FROM src WHERE oid % 11 = 0),
        mid AS (
          SELECT * FROM pre
          UNION ALL
          SELECT oid + 500000000, st, price FROM src WHERE oid % 13 = 0),
        fin AS (
          SELECT * FROM staged
          UNION ALL
          SELECT oid + 500000000, st, price FROM src WHERE oid % 13 = 0)
        SELECT side, k, n, sv FROM (
          SELECT 'stage' AS side, st AS k, count(*) AS n,
                 round(sum(price), 2) AS sv
          FROM staged GROUP BY st
          UNION ALL
          SELECT 'mid', st, count(*), round(sum(price), 2)
          FROM mid GROUP BY st
          UNION ALL
          SELECT 'state', st, count(*), round(sum(price), 2)
          FROM fin GROUP BY st) z
        ORDER BY side, k""")),

    // ---- q173: ANALYZE FOR COLUMNS + SHOW STATS under the gate —
    // the CBO-statistics surface is itself oracle-checked: after DML,
    // `ANALYZE ... FOR COLUMNS` builds the equi-height basis (two
    // distributed passes) and `SHOW STATS` prints what the optimizer
    // sees — exact min/max (externalized in the reading session),
    // exact null counts, and the bin count — values DuckDB recomputes
    // independently from the same rows. (NDV and bin endpoints are
    // estimator outputs, deliberately outside the hash.)
    Q("q173_warehouse_analyze_stats",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q173-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$tmp/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("an173_")
        t(s, dir, "orders").select(
            col("o_orderkey").cast("long").as("oid"),
            col("o_orderdate").cast("date").as("d"),
            col("o_orderstatus").as("st"))
          .createOrReplaceTempView("an173_src")
        s.sql("CREATE TABLE an173_t (oid BIGINT, d DATE, st STRING)")
        s.sql("INSERT INTO an173_t SELECT * FROM an173_src")
        s.sql("DELETE FROM an173_t WHERE oid % 7 = 0")
        val built = s.sql(
          "ANALYZE TABLE an173_t COMPUTE STATISTICS FOR COLUMNS (oid, d)")
        require(built.count() == 2L, "q173: two columns must analyze")
        val stats = s.sql("SHOW STATS an173_t")
          .select(col("column").as("c"), col("min").as("mn"),
            col("max").as("mx"), col("null_count").as("nulls"),
            col("histogram_bins").as("bins"))
          .where(col("c").isin("oid", "d"))
        val rows = s.sql(
          """SELECT 'rows' AS c, CAST(count(*) AS STRING) AS mn,
                    CAST(NULL AS STRING) AS mx,
                    CAST(NULL AS BIGINT) AS nulls,
                    CAST(NULL AS BIGINT) AS bins
             FROM an173_t""")
        stats.unionByName(rows).orderBy("c")
      },
      Some("""
        WITH pre AS (
          SELECT o_orderkey AS oid, CAST(o_orderdate AS DATE) AS d
          FROM orders WHERE o_orderkey % 7 <> 0)
        SELECT c, mn, mx, nulls, bins FROM (
          SELECT 'oid' AS c, CAST(min(oid) AS VARCHAR) AS mn,
                 CAST(max(oid) AS VARCHAR) AS mx,
                 CAST(0 AS BIGINT) AS nulls, CAST(64 AS BIGINT) AS bins
          FROM pre
          UNION ALL
          SELECT 'd', CAST(min(d) AS VARCHAR), CAST(max(d) AS VARCHAR),
                 CAST(0 AS BIGINT), CAST(64 AS BIGINT)
          FROM pre
          UNION ALL
          SELECT 'rows', CAST(count(*) AS VARCHAR), NULL,
                 CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM pre) z
        ORDER BY c"""))
  )

  /** q126's fixed BPE merge table, rank-ordered: literal so an
    * independent engine can replay segmentation without replaying the
    * training loop (which [[Vocab.bpeMerges]]' spec gates instead).
    * Merges 2/4/6 chain on 1/3/5 — rank order is load-bearing.
    */
  private def bpeFixedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e</w>", "i" -> "n", "in" -> "g</w>",
    "a" -> "n", "an" -> "d</w>", "e" -> "r", "o" -> "r",
    "s" -> "t", "t" -> "o</w>")

  /** q104's fixed PQ codebook: 4 subspaces × 4 centroids × 16 dims of
    * short-decimal doubles spanning the embeddings' ±0.5 value range.
    * Closed-form (no fit) so an independent engine can replay code
    * assignment from the same literals; `Double.toString` round-trips
    * bit-exactly through the oracle SQL text.
    */
  private[queries] def pqFixedCodebook: graft.ext.PQ.Codebook =
    (0 until 4).map(m => (0 until 4).map(k => (0 until 16).map(j =>
      (k - 1.5) * 0.25 + ((m + j) % 4) * 0.05 - 0.075)))
}

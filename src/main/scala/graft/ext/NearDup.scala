package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Deduplication operators for training-data curation, at three rungs of
  * the exactness/cost ladder:
  *
  *   1. exact       — fingerprint groupBy (one shuffle, keep-first);
  *   2. shingle-Jaccard — EXACT near-dup via an inverted-index join on
  *      token shingles (recall 1, no crossJoin anywhere; cost scales
  *      with posting-list sizes, cut by the maxShingleFreq stopword
  *      filter at scale);
  *   3. MinHash LSH — sub-linear candidate generation (band-bucket join
  *      on deterministic xxhash64 signatures) + exact verification of
  *      candidates only; tunable recall, the 100 TB path.
  *
  * Plus SimHash fingerprints for hamming-distance near-dup. All
  * signatures use seeded xxhash64 — deterministic across runs, cluster
  * sizes, and partitionings (no Math.random anywhere).
  */
object NearDup {

  /** Exact dedup, keep-first by `order`: one row per distinct normalized
    * content. Equivalent plan to groupBy(fingerprint).min — single
    * shuffle on the hash, no data explosion.
    */
  def exact(docs: DataFrame, textCol: String, order: Seq[Column]): DataFrame =
    Dedup.keepFirst(
      docs.withColumn("_fp", TextFunctions.fingerprint(col(textCol))),
      Seq("_fp"), order).drop("_fp")

  /** Distinct (id, shingle) posting pairs.
    *
    * PRECONDITION: `idCol` is unique per input row (one row per doc —
    * every declared caller feeds doc tables keyed by id). With
    * duplicate ids the row-local dedup below is weaker than the old
    * global `.distinct()`: duplicate (id, shingle) postings would
    * survive and inflate `n_common`/sizes in pairs/signatures/spans/
    * decontam. Dedupe ids upstream if the input can repeat them.
    *
    * r15 (guide §2.4): dedup PER ROW with `array_distinct` before the
    * explode instead of a `.distinct()` after it — the distinct is
    * within-doc by construction (every exploded row carries its id), so
    * the aggregate bought nothing the row-local dedup doesn't, and it
    * cost a full (id, shingle)-keyed SHUFFLE of the posting table in
    * every shingle consumer (pairs, signatures, spans, decontam). The
    * posting SET is identical; postings are now a narrow map-only pass.
    */
  private def postings(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("_id"),
      explode(array_distinct(TextFunctions.shingles(col(textCol), n)))
        .as("_sh"))

  /** EXACT pairwise Jaccard similarity over token shingles for every
    * pair sharing at least one shingle — the inverted-index ("bucket =
    * shingle") formulation:
    *
    *   postings self-join on shingle (id1 < id2) → per-pair intersection
    *   count → |A∪B| from per-doc distinct counts → J = i / (|A|+|B|-i).
    *
    * This direct form wins when shingle frequencies are flat (mostly
    * unique shingles — prose corpora): one self-join shuffle, no
    * per-doc array state. When frequencies are SKEWED (boilerplate,
    * templates), its posting lists go quadratic — switch to
    * [[jaccardPairsPrefix]], which is measured faster there and
    * identical in output.
    *
    * @param maxShingleFreq drop shingles appearing in more docs than
    *   this (0 = keep all). At scale, ultra-frequent shingles are
    *   boilerplate that blows up the self-join quadratically while
    *   contributing almost nothing to Jaccard — the standard
    *   stopword-shingle cut. Exact results require 0.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8,
      maxShingleFreq: Long = 0): DataFrame = {
    if (maxShingleFreq <= 0) {
      // r15 fast path (guide §2.3/§2.4): the per-doc distinct-shingle
      // count is a ROW-LOCAL fact (size of the distinct array), so it
      // rides the posting rows instead of being re-derived by a
      // separate groupBy — which the old shape then JOINED BACK TWICE
      // (sz1, sz2). With exchange reuse unreliable across the
      // self-join + two size joins, the scan→explode subtree was
      // evaluated up to 4× per run (q122 profile); this shape
      // evaluates it once per join side and does exactly ONE shuffle
      // class (by shingle) + the pair aggregate. Output identical:
      // same pairs, same counts, same column order ((id, sz) is
      // functionally dependent, so grouping by both changes nothing).
      val post = graft.util.Fan.widen(docs)
        .select(col(idCol).as("_id"),
          array_distinct(TextFunctions.shingles(col(textCol), n)).as("_shs"))
        .select(col("_id"), size(col("_shs")).cast("long").as("_sz"),
          explode(col("_shs")).as("_sh"))
      post.as("a")
        .join(post.as("b"), col("a._sh") === col("b._sh") &&
          col("a._id") < col("b._id"))
        .groupBy(col("a._id").as("id1"), col("b._id").as("id2"),
          col("a._sz").as("sz1"), col("b._sz").as("sz2"))
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("sz1") + col("sz2") - col("n_common")).cast("double"))
        .where(col("jaccard") >= minJaccard)
        .select(col("id1"), col("id2"), col("n_common"),
          col("sz1"), col("sz2"), col("jaccard"))
    } else {
      val post = postings(docs, idCol, textCol, n)
      val freq = post.groupBy("_sh").count()
        .where(col("count") <= maxShingleFreq).select("_sh")
      val filtered = post.join(freq, "_sh") // broadcast/shuffled by AQE
      val sizes = filtered.groupBy("_id").agg(count(lit(1)).as("_sz"))
      val inter = filtered.as("a")
        .join(filtered.as("b"), col("a._sh") === col("b._sh") &&
          col("a._id") < col("b._id"))
        .select(col("a._id").as("id1"), col("b._id").as("id2"))
      scorePairs(inter, sizes, minJaccard)
    }
  }

  /** The shared Jaccard tail: one row per (pair, shared shingle) in →
    * per-pair intersection count → J = i / (|A|+|B|−i) ≥ t out.
    */
  private def scorePairs(interRows: DataFrame, sizes: DataFrame,
      minJaccard: Double): DataFrame =
    interRows
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed("_id", "id1").withColumnRenamed("_sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("_id", "id2").withColumnRenamed("_sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz1") + col("sz2") - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("n_common"),
        col("sz1"), col("sz2"), col("jaccard"))

  /** [[jaccardPairs]] with HOT-SHINGLE SALTING — output-identical, built
    * for the skew the plain self-join cannot shed: one near-
    * `maxShingleFreq` shingle puts its whole f² pair block on a single
    * reducer (the shuffle key is the shingle), and AQE's skew handling
    * cannot split a single join KEY. The `Salted.join` salt-replicate
    * pattern, specialized to a self-join:
    *
    *   - postings split by corpus frequency: shingles with
    *     f > hotShingleFreq take the salted path, the rest join direct;
    *   - hot path: the left occurrence gets a content-derived salt
    *     (hash(id) mod buckets — deterministic, retry-safe), the right
    *     is replicated to ALL salt values; equi-join on
    *     (shingle, salt) puts each hot pair on exactly one reducer and
    *     splits the f² block `saltBuckets` ways;
    *   - each shared shingle still contributes exactly one row in
    *     exactly one path, so the unioned rows feed the same
    *     count/score tail and the result is row-identical (ExtSpec).
    *
    * Replication multiplies only the HOT postings by `saltBuckets` —
    * the cold majority pays nothing, which is what makes this viable at
    * scale where the hot set is boilerplate (small, frequent).
    */
  def jaccardPairsSalted(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8, maxShingleFreq: Long = 0,
      saltBuckets: Int = 8, hotShingleFreq: Long = 64): DataFrame = {
    val post = postings(docs, idCol, textCol, n)
    val freq = post.groupBy("_sh").agg(count(lit(1)).as("_f"))
    val kept = post.join(
      if (maxShingleFreq <= 0) freq else freq.where(col("_f") <= maxShingleFreq),
      "_sh")
    val sizes = kept.groupBy("_id").agg(count(lit(1)).as("_sz"))
    val cold = kept.where(col("_f") <= hotShingleFreq)
    val hot = kept.where(col("_f") > hotShingleFreq)
    val coldInter = cold.as("a")
      .join(cold.as("b"), col("a._sh") === col("b._sh") &&
        col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
    val hotLeft = hot.withColumn("_salt",
      pmod(xxhash64(col("_id")), lit(saltBuckets.toLong)))
    val hotRight = hot.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    val hotInter = hotLeft.as("a")
      .join(hotRight.as("b"), col("a._sh") === col("b._sh") &&
        col("a._salt") === col("b._salt") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
    scorePairs(coldInter.unionByName(hotInter), sizes, minJaccard)
  }

  /** [[jaccardPairs]] with PREFIX-FILTERED candidate generation (the
    * AllPairs/PPJoin family) + exact verification — same output, built
    * for SKEWED shingle-frequency corpora (boilerplate/templates) where
    * the direct self-join goes quadratic. Only each doc's rarest
    * |d| − ⌈t·|d|⌉ + 1 shingles enter the self-join; provably no
    * qualifying pair is lost (proof sketch inline). Costs two extra
    * shuffles (global frequency + per-doc collect) — on flat-frequency
    * corpora the direct form is faster; measured q48 (freq-cut mode)
    * 2.8s → 1.3s here vs q31 (flat) 2.9s → 13s, hence two operators.
    *
    * @param maxShingleFreq as in [[jaccardPairs]]: pre-drop shingles in
    *   more docs than this from intersections AND sizes (0 = keep all)
    */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8,
      maxShingleFreq: Long = 0): DataFrame = {
    val post = postings(docs, idCol, textCol, n)
    val freq = post.groupBy("_sh").agg(count(lit(1)).as("_f"))
    val filtered = post.join(
      if (maxShingleFreq <= 0) freq else freq.where(col("_f") <= maxShingleFreq),
      "_sh")
    // PREFIX FILTERING (AllPairs/PPJoin): sort each doc's shingles by
    // global rarity — (corpus frequency, shingle) is a consistent total
    // order — and self-join only the first |d| − ⌈t·|d|⌉ + 1 of each.
    // EXACT, no recall loss: J(A,B) ≥ t forces ≥ ⌈t·|A|⌉ common
    // shingles, so the rarest common one cannot hide in the ⌈t·|A|⌉−1
    // suffix of either side — every qualifying pair collides on a
    // prefix shingle. Probe lists shrink to the RAREST shingles (the
    // boilerplate that made the naive self-join quadratic sits in the
    // suffixes), then candidates verify exactly on the full arrays.
    // The 1e-9 slack keeps fp ceil from ROUNDING UP past the exact
    // ⌈t·|d|⌉ (a too-long prefix only adds candidates; a short one
    // would lose pairs).
    val docArr = filtered.groupBy(col("_id"))
      .agg(array_sort(collect_list(struct(col("_f"), col("_sh")))).as("_fs"))
      .select(col("_id"),
        transform(col("_fs"), x => x.getField("_sh")).as("_shs"),
        size(col("_fs")).cast("long").as("_sz"))
      .localCheckpoint() // feeds probe AND verify; also fences the
                         // slice/explode below from re-inlining the
                         // transform once per exploded row
    val plen = (col("_sz") -
      ceil(lit(minJaccard) * col("_sz").cast("double") - lit(1e-9)) + 1)
      .cast("int")
    val prefix = docArr.select(col("_id"), col("_sz"),
      explode(slice(col("_shs"), lit(1), plen)).as("_sh"))
    // symmetric length filter (J ≥ t ⇒ |B| ≥ t·|A| and |A| ≥ t·|B|)
    // prunes size-mismatched collisions before the distinct
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a._sh") === col("b._sh") && col("a._id") < col("b._id") &&
          col("b._sz").cast("double") >=
            lit(minJaccard) * col("a._sz").cast("double") - lit(1e-9) &&
          col("a._sz").cast("double") >=
            lit(minJaccard) * col("b._sz").cast("double") - lit(1e-9))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
      .distinct()
    cand
      .join(docArr.select(col("_id").as("id1"),
        col("_shs").as("shs1"), col("_sz").as("sz1")), "id1")
      .join(docArr.select(col("_id").as("id2"),
        col("_shs").as("shs2"), col("_sz").as("sz2")), "id2")
      .withColumn("n_common",
        size(array_intersect(col("shs1"), col("shs2"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz1") + col("sz2") - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("n_common"),
        col("sz1"), col("sz2"), col("jaccard"))
  }

  /** Frequency-skew statistic of the shingle distribution: Σf²/Σf, the
    * posting-list length a random posting row sits in (frequency-
    * weighted mean). Flat prose corpora sit near 1–3 (most shingles
    * unique); boilerplate/template corpora blow into the tens+ — and
    * Σf² is, exactly, the row count the direct self-join would emit, so
    * the statistic IS the cost model, per posting row.
    *
    * Computed from a 1-pass aggregate over the postings of a
    * DETERMINISTIC hash-sample of docs (xxhash64 threshold — stable
    * across runs/partitionings, never rand()). Heavy hitters survive
    * sampling by definition, which is all regime choice needs; sampling
    * scales f by ~p, so the caller-facing cutoff is interpreted against
    * the sampled statistic (default sampleFraction=1.0 → exact; at
    * 100 TB pass 0.01 and the boilerplate signal still dominates).
    */
  private[graft] def shingleSkew(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, sampleFraction: Double = 1.0): Double = {
    val sampled =
      if (sampleFraction >= 1.0) docs
      else docs.where(pmod(xxhash64(col(idCol), lit("regime")), lit(1000000L))
        < lit((sampleFraction * 1000000L).toLong))
    val f = postings(sampled, idCol, textCol, n)
      .groupBy("_sh").agg(count(lit(1)).as("_f"))
    val row = f.agg(
      sum(col("_f")).as("tot"),
      sum(col("_f") * col("_f")).as("sq")).head()
    if (row.isNullAt(0) || row.getLong(0) == 0L) 1.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  /** [[jaccardPairs]] with the REGIME CHOSEN IN-PLAN: the direct
    * inverted-index form on flat shingle frequencies, the
    * prefix-filtered AllPairs form ([[jaccardPairsPrefix]]) when the
    * frequency sketch says the direct self-join would go quadratic
    * (measured crossover: q31's flat corpus runs 2.9 s direct / 13 s
    * prefixed; q48's boilerplate shape 2.8 s direct / 1.3 s prefixed).
    * Output is identical either way (ExtSpec proves the two forms equal
    * pair-for-pair on both corpus shapes), so the choice is free to be
    * a physical-plan decision — the engine's regime optimizer, one
    * sketch aggregate as its statistics pass.
    *
    * @param skewCutoff regime threshold on [[shingleSkew]]; the default
    *   sits between flat-corpus (~1–3) and boilerplate (~10+) readings
    */
  def jaccardPairsAuto(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8, maxShingleFreq: Long = 0,
      sampleFraction: Double = 1.0, skewCutoff: Double = 8.0): DataFrame =
    if (shingleSkew(docs, idCol, textCol, n, sampleFraction) > skewCutoff)
      jaccardPairsPrefix(docs, idCol, textCol, n, minJaccard, maxShingleFreq)
    else jaccardPairs(docs, idCol, textCol, n, minJaccard, maxShingleFreq)

  /** MinHash signature: numHashes parallel min-aggregates in ONE hash
    * aggregation over the postings. The hash family is Carter-Wegman:
    * g_i(sh) = h1(sh) + i·h2(sh) with h1/h2 two seeded xxhash64 draws
    * and wrapping 64-bit arithmetic — 2-independent, which is exactly
    * what MinHash needs — so each posting row pays TWO string hashes
    * plus 64 integer multiply-adds instead of 64 string hashes (the
    * string hash dominates: shingles are ~20 bytes). Still
    * deterministic across runs/partitionings, and exact duplicates
    * still get identical signatures under ANY hash family, so the
    * recall-1-at-threshold-1 contract (q32) is structural.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64): DataFrame = {
    // wrapping Long arithmetic is the POINT of the CW family — under
    // ANSI mode the i·h2 multiply would throw on ~every row instead.
    // The library pins ANSI off session-wide (GraftSession) for the
    // reference's null-on-failure cast contract; fail fast, not mid-job,
    // if someone runs this one operator on a stock ANSI session.
    require(!docs.sparkSession.conf.get("spark.sql.ansi.enabled", "false")
        .toBoolean,
      "minhashSignatures needs spark.sql.ansi.enabled=false " +
        "(wrapping 64-bit hash arithmetic); use GraftSession")
    val aggs = (0 until numHashes).map(i =>
      min(col("_h1") + lit(i.toLong) * col("_h2")).as(s"_h$i"))
    postings(docs, idCol, textCol, n)
      .withColumn("_h1", xxhash64(col("_sh")))
      .withColumn("_h2", xxhash64(col("_sh"), lit(0x9E3779B97F4A7C15L)))
      .groupBy(col("_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("_sig"))
  }

  /** LSH banding: (band index, hash of the band's signature slice) —
    * docs colliding in ANY band become candidate pairs.
    */
  private def bands(sigs: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until numBands).map { b =>
      val rows = (0 until rowsPerBand).map(r =>
        element_at(col("_sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("bh"))
    }
    sigs.select(col("_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("_id"), col("b.band").as("_band"), col("b.bh").as("_bh"))
  }

  /** Banded candidate pairs (`id1 < id2`, distinct) from a signature
    * frame `(_id, _sig: array<long>)` — the LSH candidate stage shared
    * by [[minhashLshPairs]] (fresh signatures) and the persisted-index
    * probe ([[graft.pipeline.IndexStore]]), which is what makes
    * probe == refit structural: both run THIS plan over signature rows
    * that per-row purity makes identical.
    */
  private[graft] def bandCandidates(sigs: DataFrame, numBands: Int,
      rowsPerBand: Int): DataFrame = {
    val b = bands(sigs, numBands, rowsPerBand)
    b.as("x").join(b.as("y"),
        col("x._band") === col("y._band") && col("x._bh") === col("y._bh") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("id1"), col("y._id").as("id2"))
      .distinct()
  }

  /** EXACT Jaccard verification of candidate pairs against the docs'
    * distinct-shingle arrays — candidate volume is LSH-bounded, so the
    * per-pair array intersection is cheap and there is no crossJoin.
    * Pairs whose ids are no longer in `docs` (deleted since the index
    * was signed) inner-join away here, which is what makes a STALE
    * index entry harmless at probe time.
    */
  private[graft] def verifyJaccard(cands: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, n: Int,
      minJaccard: Double): DataFrame = {
    val shingleSets = docs.select(col(idCol).as("_id"),
      array_distinct(TextFunctions.shingles(col(textCol), n)).as("_shs"))
    cands
      .join(shingleSets.select(col("_id").as("id1"), col("_shs").as("shs1")), "id1")
      .join(shingleSets.select(col("_id").as("id2"), col("_shs").as("shs2")), "id2")
      .withColumn("n_common", size(array_intersect(col("shs1"), col("shs2"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("shs1")) + size(col("shs2")) - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("id1", "id2", "jaccard")
  }

  /** MinHash-LSH near-dup: banded candidate generation, then EXACT
    * Jaccard verification of candidates only. Recall < 1 by design;
    * tune bands/rows for the target threshold
    * (P[detect] = 1-(1-j^rows)^bands).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, numBands: Int = 16,
      minJaccard: Double = 0.8): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val sigs = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val cands = bandCandidates(sigs, numBands, numHashes / numBands)
    verifyJaccard(cands, docs, idCol, textCol, n, minJaccard)
  }

  /** 64-bit SimHash from token hashes: sign-sum of each bit of
    * xxhash64(token). Near-dups have small hamming distance. Pure
    * expressions: per-bit sums via one aggregate over exploded tokens.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("_id"),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .withColumn("_h", xxhash64(col("_t")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("_h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"_b$i"))
    val fp = (0 until 64).map(i =>
      when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce[Column](_.bitwiseOR(_))
    tok.groupBy(col("_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Cross-document REPEATED SPANS — the exact-substring rung of the
    * dedup ladder (the published form trains a suffix array over the
    * corpus; the distributed shape is a span-grained inverted index):
    * every n-token window that appears in ≥ `minDocs` DISTINCT
    * documents, with its document frequency and an id range of the
    * docs carrying it. Downstream, spans with high df are boilerplate
    * to cut or memorization hazards to audit.
    *
    * Scale: one shuffle on the span (map-side partial aggregation
    * collapses within-doc repeats first via the distinct posting set);
    * n is large (20–50 tokens published), so true collisions are rare
    * and posting lists stay short — no self-join anywhere, unlike the
    * pairwise operators above.
    */
  def crossDocSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long = 2L): DataFrame =
    postings(docs, idCol, textCol, n) // distinct (doc, span): df counts DOCS
      .withColumnRenamed("_sh", "span")
      .groupBy("span")
      .agg(count(lit(1)).as("n_docs"),
        min(col("_id")).as("min_doc"), max(col("_id")).as("max_doc"))
      .where(col("n_docs") >= minDocs)

  /** C4-style duplicate-span SCRUB — the REMOVAL transform behind
    * [[crossDocSpans]]'s detection (C4 deleted all but one occurrence
    * of any three-sentence span repeated in the corpus; the unit here
    * is the n-token span). Every occurrence of a span that appears
    * more than once — across docs or within one — is removed except
    * the globally FIRST occurrence (min (id, offset): deterministic,
    * engine-replayable), where "removed" means every token position
    * the occurrence covers is dropped; surviving tokens re-assemble in
    * order. Overlapping duplicate occurrences remove the union of
    * their positions.
    *
    * Scale shape: one shuffle of span occurrences (window partitioned
    * by span — per-span cost is linear in its occurrence count, never
    * pairwise), one distinct on removed (doc, pos), one anti-join
    * against the token stream, one per-doc fold. A boilerplate-heavy
    * corpus concentrates occurrences on few spans; the window still
    * only sorts each span's occurrence list (the quadratic blowup of
    * pair-joins on hot spans cannot happen here — removal needs rank,
    * not pairs).
    *
    * Output: (idCol, n_tokens, n_kept, text_clean) for EVERY input
    * doc — a fully-scrubbed doc keeps `text_clean = ""`.
    */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // all span occurrences WITH their offset (postings() distincts and
    // drops offsets — here each occurrence is individually removable)
    val occ = docs.select(col(idCol).as("_id"),
      posexplode(TextFunctions.shingles(col(textCol), n))
        .as(Seq("_i", "_sh")))
    val w = Window.partitionBy(col("_sh")).orderBy(col("_id"), col("_i"))
    val removedPos = occ.withColumn("_rn", row_number().over(w))
      .where(col("_rn") >= 2) // rn ≥ 2 ⟺ non-first occurrence of a dup
      .select(col("_id"),
        explode(sequence(col("_i"), col("_i") + (n - 1))).as("_pos"))
      .distinct()
    val toks = docs.select(col(idCol).as("_id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("_pos", "_tok")))
    val kept = toks.join(removedPos, Seq("_id", "_pos"), "left_anti")
    // ordered reassembly: collect_list order is partition-dependent;
    // array_sort on (pos, tok) structs restores the total token order
    val agg = kept.groupBy(col("_id"))
      .agg(count(lit(1)).as("_n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("_pos"), col("_tok")))),
            s => s.getField("_tok")), " ").as("_text"))
    docs.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(agg.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("_n_kept"), lit(0L)).cast("long").as("n_kept"),
        coalesce(col("_text"), lit("")).as("text_clean"))
  }

  /** Connected components over a near-dup pair list — the step that turns
    * pairwise similarity output (`jaccardPairs`, `minhashLshPairs`,
    * `Similarity.cosineNearDupPairs`) into dedup GROUPS: every document
    * gets `cluster_id` = the smallest reachable vertex id. When the
    * pairs' endpoints all lie inside `ids` (the usual case, e.g. q54),
    * "keep one per cluster" is a deterministic `WHERE id = cluster_id`;
    * when pairs reference docs outside `ids`, those endpoints still
    * CONDUCT connectivity (components joined only through an outside doc
    * stay joined) and `cluster_id` is then a component identifier that
    * may name an outside doc — keep-one becomes `min(id) GROUP BY
    * cluster_id`.
    *
    * Algorithm: distributed min-label propagation with pointer jumping.
    * Each round (a) takes the min component label over graph neighbors,
    * then (b) rewrites every label through the label map once more
    * (`comp(comp(v))` — path halving), so label depth shrinks
    * geometrically: rounds ≈ log₂(component diameter), not diameter.
    * Near-dup components are shallow near-cliques in practice, so this
    * converges in 2–4 rounds.
    *
    * Scale: state is only the (id, label) frame — one row per document,
    * re-shuffled by id each round; edges shuffle by endpoint. No driver
    * state beyond the per-round convergence counter (an aggregated
    * scalar), and `localCheckpoint` truncates lineage so round N's plan
    * does not replay rounds 1..N-1. Components, not the corpus, bound
    * the round count.
    *
    * @param ids   one row per vertex (documents WITHOUT any pair still
    *              get a singleton cluster)
    * @param pairs undirected edges as columns `id1`, `id2`
    */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id1").as("_src"), col("id2").as("_dst"))
      .union(pairs.select(col("id2").as("_src"), col("id1").as("_dst")))
      .distinct()
      .localCheckpoint() // reused every round — scan once, not per round
    // Vertices = ids ∪ edge endpoints: pairs may legitimately reference
    // docs outside `ids` (e.g. pairs from the full corpus, ids from one
    // slice) — silently dropping those edges would split components
    // connected only THROUGH an outside doc. Outside endpoints
    // participate in propagation and are filtered from the output.
    var comp = ids.select(col(idCol).as("_vid"))
      .union(edges.select(col("_src").as("_vid")))
      .distinct()
      .select(col("_vid"), col("_vid").as("_comp"))
      .localCheckpoint()
    val maxRounds = 50
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // (a) neighbor min: smallest label among each vertex's neighbors
      val nbrMin = edges
        .join(comp.select(col("_vid").as("_dst"), col("_comp").as("_dc")), "_dst")
        .groupBy("_src").agg(min("_dc").as("_nmin"))
        .select(col("_src").as("_vid"), col("_nmin"))
      val stepped = comp.join(nbrMin, Seq("_vid"), "left")
        .select(col("_vid"), col("_comp").as("_old"),
          least(col("_comp"), col("_nmin")).as("_comp"))
      // (b) pointer jump: labels are vertex ids, so resolve one level of
      // indirection through the label map itself (path halving). The old
      // label rides along so the convergence check below is a scan of
      // the already-materialized round output, not another join.
      val labelMap = stepped
        .select(col("_vid").as("_lk"), col("_comp").as("_lv"))
      val jumped = stepped
        .join(labelMap, stepped("_comp") === labelMap("_lk"), "left")
        .select(col("_vid"), col("_old"),
          coalesce(col("_lv"), col("_comp")).as("_comp"))
        .localCheckpoint()
      val changed = jumped.where(col("_comp") =!= col("_old")).count()
      comp = jumped.select(col("_vid"), col("_comp"))
      converged = changed == 0
      rounds += 1
    }
    require(converged, s"clusters: not converged after $maxRounds rounds")
    comp.join(ids.select(col(idCol).as("_vid")), Seq("_vid"))
      .select(col("_vid").as(idCol), col("_comp").as("cluster_id"))
  }

  /** Canonical selection: dedup that keeps the BEST copy of each
    * duplicate cluster — argmax `score` (quality, length, recency …),
    * ties to the smallest id — instead of [[exact]]'s first-seen. This
    * is the curation form of near-dedup: a boilerplate-mutated family
    * keeps its highest-quality member, wherever it appeared.
    *
    * Composes [[clusters]] (transitive components over the pair list)
    * with a per-cluster argmax window. Scale: the window partitions by
    * cluster_id — component-bounded groups, no global window; the score
    * is evaluated once per row. Determinism: argmax on
    * (round(score, 6) DESC, id) so cross-engine float noise can't flip
    * the kept member.
    *
    * @param pairs undirected duplicate edges (`id1`, `id2`), e.g. from
    *   [[jaccardPairs]] / [[minhashLshPairs]]
    * @param score any Column over `docs`' columns
    * @return every `docs` row annotated with cluster_id, cluster_size
    *   and is_kept — filter on is_kept for the deduped corpus
    */
  def keepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = clusters(docs.select(col(idCol)), idCol, pairs)
    val size = Window.partitionBy(col("cluster_id"))
    val pick = Window.partitionBy(col("cluster_id"))
      .orderBy(col("_score").desc, col(idCol))
    docs.join(cl, idCol)
      .withColumn("_score", round(score, 6))
      .withColumn("cluster_size", count(lit(1)).over(size).cast("long"))
      .withColumn("is_kept", row_number().over(pick) === 1)
      .drop("_score")
  }

  /** EDIT-DISTANCE-1 pairs via the SymSpell deletion neighborhood — the
    * typo-dedup rung for SHORT KEYS (titles, names, identifiers), where
    * shingle Jaccard is too coarse. Each key emits itself plus its
    * |key| single-character deletions; two keys within Levenshtein
    * distance 1 PROVABLY share a variant (equal → the key itself;
    * substitution at i → both drop i; insertion → the longer drops the
    * inserted char), so the variant equi-join is a LOSSLESS candidate
    * generator and the exact `levenshtein` verify makes the result
    * exact — same bucket-then-verify economics as every rung above,
    * never an all-pairs scan.
    *
    * Scale shape: ~(|key|+1) variant rows per key shuffle on the
    * variant string; candidate multiplicity collapses with a distinct
    * BEFORE the verify so each pair pays one Levenshtein.
    */
  def editDistancePairs(df: DataFrame, idCol: String,
      keyCol: String): DataFrame = {
    // empty keys are excluded: sequence(1, 0) is DESCENDING (the shingle
    // guard's trap, NearDup.shingles), and "all empty keys are pairwise
    // equal" is never the wanted typo semantics anyway
    val base = df.select(col(idCol).as("_id"), col(keyCol).as("_key"))
      .where(col("_key").isNotNull && length(col("_key")) >= 1)
    // the key plus every single-char deletion (1-based substring
    // slicing; array_union also dedups variants of repeated chars)
    val variants = base.select(col("_id"), col("_key"),
      explode(expr(
        """array_union(
             array(_key),
             transform(sequence(1, length(_key)),
                       i -> concat(substring(_key, 1, i - 1),
                                   substring(_key, i + 1, length(_key)))))"""
      )).as("_v"))
    val cand = variants.as("a")
      .join(variants.as("b"), col("a._v") === col("b._v"))
      .where(col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("a._key").as("key1"),
        col("b._id").as("id2"), col("b._key").as("key2"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("key1"), col("key2")))
      .where(col("dist") <= 1)
  }
}

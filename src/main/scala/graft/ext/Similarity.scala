package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two rungs:
  *   - brute-force top-k cosine — the exact baseline: broadcast the
  *     (small) query set, one codegen'd pass over the corpus, per-query
  *     top-k via window rank. No shuffle of the corpus itself; cost is
  *     |corpus| × |queries| dot products, embarrassingly parallel.
  *   - LSH-bucketed ANN (random hyperplane / BucketedRandomProjectionLSH
  *     from spark.ml, fixed seed) — the 100 TB path: candidates come
  *     from hash-bucket joins instead of the full cross product.
  */
object Similarity {

  /** Dot product of two array<float/double> columns via the native fused
    * `DotProduct` expression (`graft.plans`): one codegen'd loop, no
    * intermediate array, same left-to-right fold order (bit-identical
    * results) as the composable `aggregate(zip_with(...))` form it
    * replaced.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.plans.DotProduct(
        org.apache.spark.sql.GraftBridge.toExpr(a),
        org.apache.spark.sql.GraftBridge.toExpr(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize an array<float|double> column in expression space
    * (zero vectors map to zero vectors). Pure Column math — stays inside
    * WholeStageCodegen; no spark.ml UDF interop.
    */
  def l2normalize(vec: Column): Column = {
    val n = norm(vec)
    transform(vec,
      x => when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n))
  }

  /** array<float|double> → ml DenseVector, via the built-in (codegen'd)
    * converter — the single point of spark.ml interop for the LSH/KMeans
    * paths.
    */
  private def asFeatures(vec: Column): Column =
    org.apache.spark.ml.functions.array_to_vector(vec)

  /** Exact top-k cosine neighbors for each query row.
    *
    * @param queries (qid, embedding) — must be small enough to
    *   broadcast; that is the contract of a top-k *lookup* (for
    *   all-pairs similarity use the LSH path instead).
    * @return (qid, id, cosine, rank) with rank 1..k per qid, ranked on
    *   round(cosine, 6) with the id as a deterministic tiebreaker.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .where(col(idCol) =!= col(qidCol))
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        round(cosine(col(vecCol), col(qvecCol)), 6).as("cosine"))
    val rnk = row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id")))
    scored.withColumn("rank", rnk).where(col("rank") <= k)
  }

  /** HARD-NEGATIVE MINING for contrastive embedding training (the
    * dense-retrieval curation step of DPR/ANCE-style pipelines): for
    * each query, the nearest corpus vectors whose LABEL differs — the
    * semantically-close-but-wrong examples a contrastive loss learns
    * most from. Two rank cuts, both deterministic: the kCand nearest
    * by cosine (the candidate pool), then the kNeg best cross-label
    * members re-ranked within it.
    *
    * Scale shape: [[bruteForceTopK]]'s broadcast-queries contract does
    * the heavy scan (corpus never shuffles); the candidate pool
    * (|queries| × kCand rows) then BROADCASTS back onto the corpus
    * scan to attach labels — no corpus-sized shuffle anywhere. Swap
    * the candidate stage for [[ivfTopK]] at IVF scale.
    *
    * @return (qid, id, neg_label, cosine, neg_rank), neg_rank 1..kNeg
    *   per qid by (cosine desc, id)
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, qidCol: String,
      qvecCol: String, qlabelCol: String,
      kCand: Int, kNeg: Int): DataFrame = {
    require(kNeg <= kCand,
      s"hardNegatives: kNeg ($kNeg) must be <= kCand ($kCand)")
    val cands = bruteForceTopK(corpus, idCol, vecCol,
      queries.select(col(qidCol), col(qvecCol)), qidCol, qvecCol, kCand)
    val labeled = corpus
      .select(col(idCol).as("id"), col(labelCol).as("neg_label"))
      .join(broadcast(cands.select(col("qid"), col("id"), col("cosine"))),
        "id")
    val ql = queries.select(col(qidCol).as("qid"),
      col(qlabelCol).as("_qlab"))
    val negRank = row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id")))
    labeled.join(broadcast(ql), "qid")
      .where(col("neg_label") =!= col("_qlab"))
      .withColumn("neg_rank", negRank.cast("long"))
      .where(col("neg_rank") <= kNeg)
      .select(col("qid"), col("id"), col("neg_label"), col("cosine"),
        col("neg_rank"))
  }

  /** IVF (inverted-file) top-k — the other classic ANN scale path:
    * a coarse k-means quantizer splits the corpus into cells; each query
    * probes only its `nProbe` nearest cells, so the scored candidate set
    * is |corpus| × nProbe / nCells instead of |corpus|. The probe
    * assignment is a broadcast join against the (tiny) centroid table;
    * the candidate join is an equi-join on cell id — bucketed by
    * construction, no crossJoin of the corpus. Deterministic: fixed
    * k-means seed, ranking on rounded cosine with id tiebreak.
    *
    * The quantizer FITS ON A SEEDED SAMPLE (`fitFraction`), never the
    * full corpus: k-means is an iterative, driver-coordinated fit, and
    * repeated passes over a 100 TB table is exactly the cost profile IVF
    * exists to avoid. A coarse quantizer only needs enough points to
    * place nCells centroids, so the sample is statistically plenty; the
    * FULL corpus is still assigned to cells afterwards (one pass,
    * embarrassingly parallel). Corpora whose sample would be smaller
    * than `minFitRows` fall back to a full-corpus fit — at that size the
    * fit is cheap and small samples would starve the centroids.
    *
    * Recall < 1 by design (neighbors in unprobed cells are missed);
    * raise nProbe toward nCells to trade cost for recall (at
    * nProbe == nCells the result is exactly brute force, for ANY
    * quantizer — which is what makes the sampled fit safe to gate).
    */
  /** Coarse quantizer shared by the IVF and SemDeDup rungs: fit k-means
    * ON A SEEDED SAMPLE (`fitFraction`), never the full corpus — k-means
    * is an iterative, driver-coordinated fit, and repeated passes over a
    * 100 TB table is exactly the cost profile cell-bucketing exists to
    * avoid. A coarse quantizer only needs enough points to place nCells
    * centroids, so the sample is statistically plenty; the FULL corpus
    * is still assigned to cells afterwards (one pass, embarrassingly
    * parallel). Corpora whose sample would be smaller than `minFitRows`
    * fall back to a full-corpus fit — at that size the fit is cheap and
    * small samples would starve the centroids.
    *
    * @return (assigned `(id, vec, cell)` frame, centroid rows
    *         `(cell, centroid: array<float>)` — tiny, broadcastable)
    */
  /** Resolve an `nCells` request: explicit positive values pass
    * through; `<= 0` means SCALE WITH THE CORPUS — ceil(√N), floored at
    * 16 (one cheap count). √N is the classic IVF balance point: it
    * makes E[|cell|] = √N too, so the Σ|cell|² intra-cell work is ~N·√N
    * instead of the N²/k a FIXED k degrades to as the corpus grows.
    */
  private[ext] def resolveCells(corpus: DataFrame, nCells: Int): Int =
    if (nCells > 0) nCells
    else math.max(16, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)

  private[ext] def assignCells(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, fitFraction: Double,
      minFitRows: Long): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val corpusV = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("features", asFeatures(col("vec")))
    val kCells = resolveCells(corpusV, nCells)
    val sampled = corpusV.sample(withReplacement = false, fitFraction, 42L)
    val fitSet =
      if (fitFraction >= 1.0) corpusV
      else if (sampled.count() >= math.max(minFitRows, 4L * kCells)) sampled
      else corpusV // small-corpus fallback: sample would starve the fit
    // a COARSE quantizer doesn't need converged centroids — cells only
    // gate candidate discovery (probe-all IVF and exact-copy SemDeDup
    // results are invariant to centroid quality), so cap the iterative
    // driver-coordinated fit well below the spark.ml default of 20
    val model = new KMeans().setK(kCells).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(fitSet)
    val assigned = model.transform(corpusV).select(
      col("id"), col("vec"), col("cell"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toDF("cell", "centroid")
    (assigned, centroids)
  }

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      fitFraction: Double = 0.1, minFitRows: Long = 256): DataFrame = {
    // centroid table: tiny (nCells × dim) → broadcast to every query row
    val (assigned, centroids) = assignCells(
      corpus, idCol, vecCol, nCells, fitFraction, minFitRows)
    val probes = queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .join(broadcast(centroids))
      .select(col("qid"), col("qvec"), col("cell"),
        dot(col("qvec"), col("centroid")).as("cdot"),
        norm(col("centroid")).as("cnorm"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid")
          .orderBy((col("cdot") / col("cnorm")).desc, col("cell"))))
      .where(col("crank") <= nProbe)
      .select("qid", "qvec", "cell")

    val scored = probes.join(assigned, "cell") // bucketed candidate join
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(cosine(col("vec"), col("qvec")), 6).as("cosine"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs over the WHOLE corpus — the
    * dedup-by-embedding rung: LSH-bucketed self-join (no |corpus|² scan)
    * followed by exact cosine verification of candidates. On normalized
    * vectors, cosine ≥ minCosine ⟺ euclidean ≤ sqrt(2 − 2·minCosine),
    * which is the LSH join radius used.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bucketLength: Double = 0.0,
      numTables: Int = 3): DataFrame = {
    val a = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("features", asFeatures(l2normalize(col("vec"))))
    val radius = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))
    // Default bucket length SCALES WITH THE SEARCH RADIUS (4×r, floored
    // for the r→0 exact-dup case). On normalized vectors every random
    // projection is ~N(0,1), so a FIXED bucket length spreads the whole
    // corpus over a constant number of buckets — at high thresholds the
    // "LSH" self-join quietly degenerates to Σ|bucket|² ≈ |corpus|²/c
    // (the r5 10× suite caught q40 at 81× for 10× data exactly this
    // way). 4×r keeps per-table miss probability for a true pair at
    // ~r/(4r) = 25%, i.e. ~1.6% after 3 tables, while bucket occupancy
    // now shrinks as the threshold tightens.
    val bl = if (bucketLength > 0) bucketLength else math.max(4 * radius, 0.05)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bl).setNumHashTables(numTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(a)
    model.approxSimilarityJoin(model.transform(a), model.transform(a),
        radius, "dist")
      .select(col("datasetA.id").as("id1"), col("datasetA.vec").as("vec1"),
        col("datasetB.id").as("id2"), col("datasetB.vec").as("vec2"))
      .where(col("id1") < col("id2"))
      .withColumn("cosine", round(cosine(col("vec1"), col("vec2")), 6))
      .where(col("cosine") >= minCosine) // exact verification
      .select("id1", "id2", "cosine")
      .distinct()
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus into cells with the sampled
    * coarse quantizer, compute exact pairwise cosine ONLY within each
    * cell, and connect the over-threshold pairs into duplicate groups
    * (connected components via `NearDup.clusters`). One canonical doc
    * per group (the min id — labels are min vertex ids) survives; the
    * rest are semantic duplicates to prune.
    *
    * Scale shape: the quadratic is bounded per cell — Σ|cell|² work,
    * never |corpus|² (the published design point: cells play the role
    * LSH bands play one rung down); the pair join is an equi-join on
    * `cell`, bucketed by construction. The default `nCells = 0` SCALES
    * the cell count with the corpus (≈√N, [[resolveCells]]) — a fixed
    * k would quietly degrade Σ|cell|² back toward N²/k as the corpus
    * grows. Recall < 1 by design: a duplicate pair straddling a cell
    * boundary is missed, the standard SemDeDup trade — `nProbe = 2`
    * assigns each vector to its 2 nearest cells so boundary pairs meet
    * in one of them (multi-probe; cost scales by ≤ nProbe² per cell
    * pair, recall rises accordingly).
    *
    * @return one row per corpus doc: (idCol, cluster_id, cluster_size,
    *         is_kept) — `is_kept` marks the group canonical
    */
  def semDeDup(corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nCells: Int = 0, fitFraction: Double = 0.1,
      minFitRows: Long = 256, nProbe: Int = 1): DataFrame = {
    val (assigned, centroids) = assignCells(
      corpus, idCol, vecCol, nCells, fitFraction, minFitRows)
    // multi-probe: re-rank every vector against ALL centroids
    // (broadcast — nCells × dim is tiny) and keep the nProbe nearest
    // cells; rank<=k folds to a map-side WindowGroupLimit. nProbe=1
    // keeps the quantizer's own assignment (identical plan to r4).
    // r15: materialize the (id, vec, cell) assignment once — it feeds
    // BOTH sides of the intra-cell self-join below, and left lazy each
    // side re-ran the k-means predict (an ml UDF pipeline) and, for
    // nProbe > 1, the multi-probe re-rank window. This is exactly the
    // table IndexStore.buildIvf persists at warehouse scale (the IVF
    // assignment artifact); one in-memory materialization is its
    // per-query form.
    val probed = (
      if (nProbe <= 1) assigned
      else assigned.select(col("id"), col("vec"))
        .join(broadcast(centroids))
        .withColumn("d2",
          dot(col("vec"), col("vec"))
            - lit(2.0) * dot(col("vec"), col("centroid"))
            + dot(col("centroid"), col("centroid")))
        .withColumn("crank", row_number().over(
          Window.partitionBy("id").orderBy(col("d2"), col("cell"))))
        .where(col("crank") <= nProbe)
        .select("id", "vec", "cell")
    ).localCheckpoint()
    val left = probed.select(col("cell"),
      col("id").as("id1"), col("vec").as("vec1"))
    val right = probed.select(col("cell"),
      col("id").as("id2"), col("vec").as("vec2"))
    val pairs = left.join(right, "cell") // intra-cell only: Σ|cell|²
      .where(col("id1") < col("id2"))
      .where(cosine(col("vec1"), col("vec2")) >= minCosine)
      .select("id1", "id2")
    // multi-probe can discover one pair in BOTH shared cells
    val edges = if (nProbe <= 1) pairs else pairs.distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    NearDup.clusters(corpus.select(col(idCol)), idCol, edges)
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .withColumn("is_kept", col(idCol) === col("cluster_id"))
  }

  /** ANN via random-hyperplane LSH (spark.ml BucketedRandomProjectionLSH,
    * deterministic seed). Returns approximate neighbor pairs within
    * `threshold` EUCLIDEAN distance; on L2-normalized vectors euclidean
    * and cosine rank identically (d² = 2 − 2cos), which is how callers
    * should feed it for cosine semantics.
    */
  /** Symmetric int8 scalar quantization of an embedding column — the
    * storage-side operator of the similarity stack: 4× smaller vectors
    * (plus one scale per vector) at a small recall cost, the standard
    * first compression rung before PQ/IVF codebooks.
    *
    * `q[i] = floor(v[i] / scale * 127)` with `scale = max|v|` (all-zero
    * vectors quantize to zeros). Arithmetic is forced to DOUBLE and uses
    * floor, not round/cast — both portable to the last bit across
    * engines (round-half and int-cast semantics differ; floor on
    * non-negative-exponent doubles does not).
    *
    * Pure per-row codegen'd expressions: no shuffle, no state.
    *
    * @return (scaleCol, qvecCol) to select alongside the id
    */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val scale = array_max(transform(vec, v => abs(v)))
    val q = when(scale.isNull || scale === 0,
        transform(vec, _ => lit(0)))
      .otherwise(transform(vec, v =>
        floor(v.cast("double") / scale.cast("double") * 127).cast("int")))
    (scale.cast("double"), q)
  }

  /** Dequantize back to the approximate float vector. */
  def dequantizeInt8(scale: Column, qvec: Column): Column =
    transform(qvec, q => (q.cast("double") * scale / 127).cast("float"))

  def annCandidates(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      threshold: Double, bucketLength: Double = 2.0,
      numTables: Int = 3): DataFrame = {
    val a = corpus.select(col(idCol).as("id"),
      asFeatures(l2normalize(col(vecCol))).as("features"))
    val b = queries.select(col(qidCol).as("qid"),
      asFeatures(l2normalize(col(qvecCol))).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(a)
    model.approxSimilarityJoin(model.transform(a), model.transform(b),
        threshold, "dist")
      .select(col("datasetB.qid").as("qid"), col("datasetA.id").as("id"),
        col("dist"))
      .where(col("qid") =!= col("id"))
  }
}

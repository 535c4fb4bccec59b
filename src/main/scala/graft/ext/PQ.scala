package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression rung after int8
  * (q57): split each D-dim vector into `m` subspaces of D/m dims,
  * vector-quantize each subspace against a K-entry codebook, and store
  * only the m byte-sized codes (64 float dims → 8 codes is a 32×
  * compression). Approximate distances are ASYMMETRIC (ADC): the query
  * stays exact, each corpus vector is represented by its per-subspace
  * centroids, and dist(q, v) ≈ Σₘ ‖q_sub(m) − centroid[m][code_m(v)]‖²
  * — the published IVF-PQ scoring form.
  *
  * Scale shape: the codebook is m × K × (D/m) doubles — tiny, embedded
  * in the PLAN as a literal, so ENCODING IS A PURE PER-ROW PROJECTION:
  * no shuffle, no join, no state — the 100 TB encode is a map over the
  * corpus. Scoring broadcasts the query set (the brute-topK shape) and
  * ranks with a per-query window (map-side WindowGroupLimit under
  * rank ≤ k). Fitting is the only iterative step and runs on a SEEDED
  * SAMPLE (m small k-means fits), never the full corpus — the same
  * sampled-quantizer stance as [[Similarity.assignCells]].
  *
  * Determinism: all arithmetic is DOUBLE with fixed fold order
  * (`aggregate` over ordered arrays), ties in code assignment break to
  * the SMALLEST code (strict argmin, first occurrence) — the properties
  * that let an independent engine replay encode+ADC bit-exactly from
  * the same codebook (q104's DuckDB oracle does exactly that).
  */
object PQ {

  /** m → K → (D/m) per-subspace centroids. */
  type Codebook = Seq[Seq[Seq[Double]]]

  private def subDim(cb: Codebook): Int = cb.head.head.size

  /** Fit per-subspace codebooks by k-means on a seeded sample of the
    * corpus (fraction `fitFraction`, full corpus when the sample would
    * starve the fit). One small spark.ml fit per subspace, capped at 8
    * iterations — coarse codebooks only gate candidate quality, and the
    * ADC scoring stays correct for ANY codebook.
    */
  def fitCodebook(corpus: DataFrame, vecCol: String, m: Int, k: Int,
      fitFraction: Double = 0.1, seed: Long = 42L,
      minFitRows: Long = 256): Codebook = {
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val sampled = corpus.sample(withReplacement = false, fitFraction, seed)
    val fitSet =
      if (fitFraction >= 1.0) corpus
      else if (sampled.count() >= math.max(minFitRows, 4L * k)) sampled
      else corpus
    (0 until m).map { mi =>
      val feats = fitSet.select(
        org.apache.spark.ml.functions.array_to_vector(
          slice(col(vecCol), mi * sub + 1, sub).cast("array<double>"))
          .as("features"))
      new KMeans().setK(k).setSeed(seed + mi).setMaxIter(8)
        .setFeaturesCol("features").fit(feats)
        .clusterCenters.toSeq.map(_.toArray.toSeq)
    }
  }

  /** `array<int>` of length m: each subspace's nearest-centroid code
    * (strict argmin, smallest code on exact ties). Pure per-row
    * expression — the codebook rides the plan as a literal.
    */
  def encodeExpr(vec: Column, cb: Codebook): Column = {
    val sub = subDim(cb)
    val cbLit = typedlit(cb)
    transform(sequence(lit(0), lit(cb.size - 1)), mi => {
      val subv = slice(vec, mi * sub + 1, lit(sub))
      val dists = transform(element_at(cbLit, mi + 1), c =>
        aggregate(
          zip_with(subv, c, (a, b) =>
            (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  /** Asymmetric (ADC) approximate squared-euclidean distance between an
    * exact query vector and a PQ-coded corpus vector.
    */
  def adcDistExpr(qvec: Column, codes: Column, cb: Codebook): Column = {
    val sub = subDim(cb)
    val cbLit = typedlit(cb)
    aggregate(sequence(lit(0), lit(cb.size - 1)), lit(0.0), (acc, mi) => {
      val subq = slice(qvec, mi * sub + 1, lit(sub))
      val cent = element_at(element_at(cbLit, mi + 1),
        element_at(codes, mi + 1) + 1)
      acc + aggregate(
        zip_with(subq, cent, (a, b) =>
          (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (a2, x) => a2 + x)
    })
  }

  /** Approximate k-NN: PQ-encode the corpus (pure projection),
    * broadcast the query set, ADC-score every (query, doc) pair, keep
    * the k nearest per query (rounded-distance, id-tiebroken ranking —
    * stable across engines). The corpus never shuffles.
    */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, cb: Codebook): DataFrame = {
    val encoded = corpus.select(col(idCol).as("id"),
      encodeExpr(col(vecCol), cb).as("codes"))
    encoded.crossJoin(broadcast(
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(adcDistExpr(col("qvec"), col("codes"), cb), 6).as("adist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("adist"), col("id"))))
      .where(col("rank") <= k)
  }

  /** Full IVF-PQ: the coarse IVF quantizer
    * ([[Similarity.assignCells]], seeded-sample fit) restricts each
    * query's ADC scan to its `nProbe` nearest cells, and PQ codes stand
    * in for the vectors inside them — the two published approximations
    * composed, which is THE 100 TB ANN layout (a plain ADC sweep is
    * still O(|corpus|) per query; cells cut it to ~nProbe/nCells of
    * that). Candidate discovery is a bucketed equi-join on `cell`
    * exactly like [[Similarity.ivfTopK]]; at `nProbe == nCells` the
    * result equals [[topK]] for ANY quantizer (the probe-all
    * invariant), which is what makes the sampled fit safe.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, cb: Codebook, nCells: Int = 16, nProbe: Int = 4,
      fitFraction: Double = 0.1, minFitRows: Long = 256): DataFrame = {
    val (assigned, centroids) = Similarity.assignCells(
      corpus, idCol, vecCol, nCells, fitFraction, minFitRows)
    // PQ codes ride the assigned frame — still a pure projection
    val encoded = assigned.select(col("id"), col("cell"),
      encodeExpr(col("vec"), cb).as("codes"))
    // per-query nProbe nearest cells by exact euclidean distance to the
    // centroid (ADC approximates euclidean, so the probe metric matches)
    val probes = queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .join(broadcast(centroids))
      .withColumn("d2",
        Similarity.dot(col("qvec"), col("qvec"))
          - lit(2.0) * Similarity.dot(col("qvec"), col("centroid"))
          + Similarity.dot(col("centroid"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("d2"), col("cell"))))
      .where(col("crank") <= nProbe)
      .select("qid", "qvec", "cell")
    probes.join(encoded, "cell") // bucketed candidate join
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(adcDistExpr(col("qvec"), col("codes"), cb), 6).as("adist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("adist"), col("id"))))
      .where(col("rank") <= k)
  }
}

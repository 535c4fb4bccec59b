package graft.ext

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
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

  /** ANN via random-hyperplane LSH (spark.ml BucketedRandomProjectionLSH,
    * deterministic seed). Returns approximate neighbor pairs within
    * `threshold` EUCLIDEAN distance; on L2-normalized vectors euclidean
    * and cosine rank identically (d² = 2 − 2cos), which is how callers
    * should feed it for cosine semantics.
    */
  def annCandidates(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      threshold: Double, bucketLength: Double = 2.0,
      numTables: Int = 3): DataFrame = {
    val toVec = udf((xs: Seq[Float]) =>
      Vectors.dense(xs.map(_.toDouble).toArray))
    val normalize = udf((v: Vector) => {
      val n = math.sqrt(v.toArray.map(x => x * x).sum)
      Vectors.dense(v.toArray.map(x => if (n == 0) 0.0 else x / n))
    })
    val a = corpus.select(col(idCol).as("id"),
      normalize(toVec(col(vecCol))).as("features"))
    val b = queries.select(col(qidCol).as("qid"),
      normalize(toVec(col(qvecCol))).as("features"))
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

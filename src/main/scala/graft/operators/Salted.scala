package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives: salting spreads a hot key over
  * `buckets` sub-keys so no single task owns the whole key's data.
  *
  * AQE's skew-join handling (enabled in `GraftSession`) covers the
  * sort-merge-join case at runtime; these helpers cover the two shapes
  * AQE does not: skewed AGGREGATION (two-phase salted combine) and
  * skewed joins where one side is small enough to replicate but too
  * skew-critical to leave to a single reducer.
  *
  * Salts are derived from row content (hash mod buckets) — never from
  * rand() — so results are deterministic across runs, retries, and
  * partitionings (a lost-task retry with a random salt would double
  * count).
  */
object Salted {

  /** Deterministic salt in [0, buckets) from arbitrary columns. */
  def saltOf(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted aggregation: partial combine on (keys ++ salt)
    * spreads each hot key over `buckets` reducers; the final combine on
    * keys sees at most `buckets` rows per key. `aggs` must be
    * decomposable (sum/count/min/max — the partial and final functions
    * coincide for these).
    */
  def aggregate(df: DataFrame, keys: Seq[String], salt: Column,
      buckets: Int, aggs: Map[String, String]): DataFrame = {
    // fail fast on non-decomposable aggregates: avg-of-avgs (etc.) would
    // silently refold to a WRONG result, not an error
    val decomposable = Set("sum", "count", "min", "max")
    require(aggs.values.forall(f => decomposable(f.toLowerCase)),
      s"Salted.aggregate supports only decomposable aggregates " +
        s"${decomposable.mkString("{", ",", "}")}; got ${aggs.values.toSet}")
    val salted = df.withColumn("_salt", pmod(salt, lit(buckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.map { case (c, f) => expr(s"$f($c)").as(c) }.toSeq.head,
        aggs.toSeq.tail.map { case (c, f) => expr(s"$f($c)").as(c) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.toSeq.map { case (c, f) =>
          val refold = if (f == "count") "sum" else f
          expr(s"$refold($c)").as(c)
        }.head,
        aggs.toSeq.tail.map { case (c, f) =>
          val refold = if (f == "count") "sum" else f
          expr(s"$refold($c)").as(c)
        }: _*)
  }

  /** Skew-safe equi-join: the big (skewed) side gets a content-derived
    * salt; the small side is replicated across all `buckets` salt values
    * (explode of a literal range — |small| × buckets rows, the price of
    * removing the hot-key bottleneck). Semantics identical to
    * `big.join(small, keys)`.
    */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      saltOf(buckets, big.columns.map(col): _*))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — mixture shaping
  * ("2 parts web, 1 part code"), per-language rebalancing, held-out
  * splits.
  *
  * Spark's `sample()`/`sampleBy()` draw from per-partition RNG streams:
  * the kept set changes with partitioning, task retries re-draw, and no
  * other engine can replay the decision. Training pipelines need the
  * opposite — membership must be a pure function of the ROW, so the
  * same doc is kept everywhere, forever, and an oracle can re-derive
  * the exact sample. The standard trick: hash the row id with a salt,
  * keep if the hash falls below the rate's threshold.
  *
  * Implementation detail that keeps it engine-portable: the decision
  * compares the first 8 hex chars of `md5(id || ':' || salt)`
  * LEXICOGRAPHICALLY against the rate's hex threshold. Hex digits of
  * md5 are uniform, and fixed-width hex order = numeric order, so
  * `prefix8 < hexCut(r)` keeps fraction r exactly — in any engine with
  * md5 and string compare, no integer parsing anywhere.
  *
  * Scale: a per-row codegen'd expression — no shuffle, no state, no
  * driver involvement; composes with pushdown (the filter sits on the
  * scan). Different salts give independent samples (splits: train =
  * kept(salt,"a",0.9), eval = its complement, NOT a second draw).
  */
object Sampling {

  /** 8-hex-char uniform bucket of (id, salt) — the sampling coordinate. */
  def hashCoord(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit(":" + salt)).cast("binary")), 1, 8)

  /** Threshold such that P[hashCoord < hexCut(rate)] = rate (4-byte
    * resolution ≈ 2.3e-10). Rates ≥ 1 keep everything; ≤ 0 nothing.
    */
  def hexCut(rate: Double): String = {
    val n = math.round(rate * 4294967296.0) // 2^32
    if (n >= 4294967296L) "g" // > every hex char: keep all
    else if (n <= 0) ""       // < every hex string: keep none
    else f"$n%08x"
  }

  /** Keep a deterministic `rate` fraction of rows, keyed by `idCol`. */
  def sample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.where(hashCoord(col(idCol), salt) < lit(hexCut(rate)))

  /** Stratified deterministic sampling: per-stratum rates from a small
    * dim (broadcast — the fact side never shuffles). Strata absent from
    * `rates` are kept in full (rate 1).
    *
    * @param rates (stratum, rate) pairs, e.g. ("en", 0.5)
    */
  def sampleBy(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate strata in rates: a repeated stratum would fan rows " +
        s"out through the join — ${rates.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val cuts = rates.map { case (s, r) => (s, hexCut(r)) }
      .toDF(strataCol, "_cut")
    df.join(broadcast(cuts), Seq(strataCol), "left")
      .where(hashCoord(col(idCol), salt) < coalesce(col("_cut"), lit("g")))
      .drop("_cut")
  }

  /** Mixture REBALANCING: the largest subcorpus whose strata follow the
    * target `weights` (in expectation — membership is per-row
    * hash-threshold, so realized counts are rate·n ± binomial noise,
    * vanishing at corpus scale). With n_s rows per stratum and weight w_s,
    * the binding stratum sets the scale λ* = min_s(n_s / w_s); every
    * stratum keeps rate_s = λ*·w_s / n_s of its rows (the binding one
    * keeps all). Strata without a declared weight are dropped (weight
    * 0) — rebalancing DECLARES the mixture, unlike [[sampleBy]]'s
    * keep-undeclared default for ad-hoc thinning.
    *
    * Everything happens in-plan — per-stratum counts (tiny agg), λ* (an
    * aggregate of that tiny frame, cross-joined back as a broadcast
    * scalar), and the per-row hash-threshold decision — so there is no
    * driver-side collect, and the kept set is a pure function of
    * (row id, salt, corpus counts): deterministic across runs,
    * partitionings, and engines.
    *
    * Engine-portability of the threshold: the cut is built IN-PLAN as
    * 8 lowercase hex chars of floor(rate·2³²) (rates of 1 map to the
    * above-every-hex sentinel), so an oracle that computes the same
    * counts reproduces the exact kept set. Weights that are powers of
    * two keep n_s / w_s float-exact; other weights still replay (IEEE
    * ops are deterministic), they just aren't round numbers.
    */
  /** Deterministic per-key VOLUME CAP — the domain-balancing rung of
    * web-corpus curation: keep at most `cap` rows per key (source,
    * domain, host) so no single origin dominates the mixture, choosing
    * WHICH rows by the same hash coordinate as [[sample]] rather than
    * arrival order. A pure function of (id, salt, key's member set):
    * the kept set is identical across runs, partitionings, task
    * retries, and engines.
    *
    * Scale shape: one exchange on the key, then a per-key window —
    * groups are bounded by per-key row counts (a pathologically hot
    * key still sorts its own group once; pre-split upstream if one key
    * exceeds a partition). Unlike rate-based [[sampleBy]], the cap is
    * an absolute bound: a 10⁹-doc domain and a 10³-doc domain both cap
    * at `cap`.
    *
    * @return input rows with `key_rank` (1-based priority rank within
    *   the key), filtered to key_rank <= cap
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String, cap: Int,
      salt: String = "graft"): DataFrame = {
    require(cap > 0, s"capPerKey: cap must be > 0, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashCoord(col(idCol), salt), col(idCol))
    df.withColumn("key_rank", row_number().over(w).cast("long"))
      .where(col("key_rank") <= cap)
  }

  /** TEMPERATURE-sampled mixture (the multilingual-pretraining rule of
    * XLM/mBERT/mT5): resample so stratum s's share follows
    * q_s ∝ n_s^α — α = 1 keeps the natural distribution, α = 0 is
    * uniform, and the published α ≈ 0.3–0.7 range lifts low-resource
    * strata without drowning high-resource ones. Exactly [[rebalance]]
    * with weights derived IN-PLAN from the stratum counts (w_s = n_s^α;
    * λ* normalization makes proportionality sufficient), so the whole
    * decision remains a pure function of (row id, salt, corpus counts):
    * per-stratum counts (tiny agg) → binding-stratum scale (broadcast
    * scalar) → per-row hash threshold. α = 0.5 computes via sqrt
    * (correctly rounded by IEEE in every engine, unlike pow's 1-ulp
    * licence — oracle-exact thresholds).
    */
  def temperature(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double = 0.5, salt: String = "graft"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("_n"))
      .withColumn("_wt",
        if (alpha == 0.5) sqrt(col("_n").cast("double"))
        else pow(col("_n").cast("double"), alpha))
    val lam = counts.agg(min(col("_n").cast("double") / col("_wt"))
      .as("_lam"))
    val cutExpr = {
      val n = floor(col("_lam") * col("_wt") / col("_n").cast("double") *
        lit(4294967296.0)).cast("bigint")
      when(n >= 4294967296L, lit("g"))
        .otherwise(lpad(lower(hex(n)), 8, "0"))
    }
    val cuts = counts.crossJoin(broadcast(lam))
      .select(col(strataCol), cutExpr.as("_cut"))
    df.join(broadcast(cuts), Seq(strataCol))
      .where(hashCoord(col(idCol), salt) < col("_cut"))
      .drop("_cut")
  }

  def rebalance(df: DataFrame, idCol: String, strataCol: String,
      weights: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"rebalance needs positive weights, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate strata in weights: ${weights.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val wdim = weights.toDF(strataCol, "_wt")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("_n"))
      .join(broadcast(wdim), strataCol) // inner: undeclared strata drop
    val lam = counts.agg(min(col("_n").cast("double") / col("_wt"))
      .as("_lam"))
    val cutExpr = {
      val n = floor(col("_lam") * col("_wt") / col("_n").cast("double") *
        lit(4294967296.0)).cast("bigint")
      when(n >= 4294967296L, lit("g"))
        .otherwise(lpad(lower(hex(n)), 8, "0"))
    }
    val cuts = counts.crossJoin(broadcast(lam))
      .select(col(strataCol), cutExpr.as("_cut"))
    df.join(broadcast(cuts), Seq(strataCol))
      .where(hashCoord(col(idCol), salt) < col("_cut"))
      .drop("_cut")
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DOMAIN MIXTURE OPTIMIZATION for training-data curation — the
  * DoReMi-shaped loop (Xie et al. 2023, "DoReMi: Optimizing Data
  * Mixtures Speeds Up Language Model Pretraining"): start from a
  * uniform domain mixture, repeatedly up-weight domains whose proxy
  * loss exceeds the mixture-weighted average and renormalize on the
  * simplex, then materialize the optimized mixture as a deterministic
  * per-domain hash sample.
  *
  * Two deliberate departures from the paper, both about replayability:
  *   - the per-domain EXCESS signal is a corpus statistic (relative
  *     deviation of the domain's mean document length from the overall
  *     mean) rather than a proxy-model loss — the engine curates data,
  *     it does not train models; any per-domain scalar plugs in;
  *   - the update is the LINEAR multiplicative-weights rule
  *     `w ← w·(1 + η·(excess − ⟨excess⟩_w))` — the first-order Taylor
  *     expansion of DoReMi's exponentiated update `w·exp(η·…)`. exp()
  *     carries a 1-ulp licence that differs across libms, so the
  *     exponentiated form cannot be replayed bit-exactly by an
  *     independent engine; +,×,/ are IEEE-exact everywhere. With fixed
  *     domain order and left-to-right folds the whole solve is
  *     bit-reproducible in any engine (the DuckDB oracle replays it
  *     with ordered `list_reduce` folds).
  *
  * Scale shape: the solver input is ONE tiny aggregate (one row per
  * domain — the standard model-sized driver state, like IVF centroids);
  * the solve itself is O(rounds × domains) driver arithmetic; the
  * materialization is a broadcast cut-table join + a pure per-row hash
  * threshold ([[Sampling.hashCoord]]) — the corpus is scanned once for
  * stats and once for membership, shuffled never.
  */
object Mixture {

  /** One solved domain: its document count, excess signal, and final
    * mixture weight (weights sum to 1 across the returned seq).
    */
  final case class DomainWeight(domain: String, n: Long, excess: Double,
      weight: Double)

  /** Solve the mixture from per-domain stats `(domain, docCount,
    * statSum)`: excess_d = ((statSum_d/n_d) − overallMean)/overallMean,
    * then `rounds` linear-MW steps from the uniform mixture. Input
    * order is irrelevant (domains are sorted internally); all folds are
    * left-to-right over that sorted order, so the result is
    * bit-deterministic.
    *
    * @param eta step size; must keep every `1 + η·(excess − ⟨excess⟩)`
    *   positive (checked per round — fail fast beats silent negative
    *   weights)
    */
  def doremiWeights(stats: Seq[(String, Long, Double)], eta: Double = 0.25,
      rounds: Int = 4): Seq[DomainWeight] = {
    require(stats.nonEmpty, "doremiWeights: no domains")
    require(stats.map(_._1).distinct.size == stats.size,
      "doremiWeights: duplicate domains")
    require(stats.forall(_._2 > 0), "doremiWeights: empty domain")
    val sorted = stats.sortBy(_._1)
    val ns = sorted.map(_._2.toDouble)
    val scs = sorted.map(_._3)
    val om = scs.foldLeft(0.0)(_ + _) / ns.foldLeft(0.0)(_ + _)
    val exs = sorted.indices.map(i => ((scs(i) / ns(i)) - om) / om)
    var w = Vector.fill(sorted.size)(1.0 / sorted.size)
    for (_ <- 0 until rounds) {
      val wm = sorted.indices.foldLeft(0.0)((a, i) => a + w(i) * exs(i))
      val raw = sorted.indices.map(i => w(i) * (1.0 + eta * (exs(i) - wm)))
      require(raw.forall(_ > 0.0),
        s"doremiWeights: eta=$eta too large (negative weight)")
      val z = raw.foldLeft(0.0)(_ + _)
      w = raw.map(_ / z).toVector
    }
    sorted.indices.map(i =>
      DomainWeight(sorted(i)._1, sorted(i)._2, exs(i), w(i)))
  }

  /** Per-domain sampling rate for a `targetRows`-sized mixture:
    * `min(1, (weight·targetRows)/n)` — the association order is part of
    * the replay contract (the oracle computes the identical product
    * before the divide).
    */
  def domainRate(dw: DomainWeight, targetRows: Double): Double =
    math.min(1.0, (dw.weight * targetRows) / dw.n.toDouble)

  /** Hash-threshold cut for a rate, floor-quantized to 1/2³² (floor in
    * BOTH engines — [[Sampling.hexCut]]'s round() is half-up, whose
    * boundary behavior is engine-sensitive; floor is not).
    */
  def rateCut(rate: Double): String = {
    val f = math.floor(rate * 4294967296.0).toLong
    if (f >= 4294967296L) "g" else f"$f%08x"
  }

  /** Materialize the solved mixture: keep each domain's rows whose
    * [[Sampling.hashCoord]] falls under the domain's rate cut — a pure
    * function of (row id, salt, solved weights), reproducible across
    * engines, partitionings, and retries. Cut table broadcasts (one row
    * per domain); the corpus never shuffles.
    */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      weights: Seq[DomainWeight], targetRows: Double,
      salt: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cuts = weights
      .map(dw => (dw.domain, rateCut(domainRate(dw, targetRows))))
      .toDF(domainCol, "_cut")
    df.join(broadcast(cuts), Seq(domainCol))
      .where(Sampling.hashCoord(col(idCol), salt) < col("_cut"))
      .drop("_cut")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.Mixture

/** Mixture solver contract: simplex invariants, direction of the
  * update, fail-fast on a destabilizing step size, and engine-grade
  * determinism of the materialized sample.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val stats = Seq(
    ("en", 1000L, 500000.0), // mean 500
    ("de", 400L, 120000.0),  // mean 300
    ("fr", 100L, 90000.0))   // mean 900 — highest excess

  test("weights stay on the simplex and order by excess") {
    val ws = Mixture.doremiWeights(stats, eta = 0.25, rounds = 4)
    assert(ws.map(_.domain) === Seq("de", "en", "fr")) // sorted
    assert(math.abs(ws.map(_.weight).sum - 1.0) < 1e-12)
    assert(ws.forall(_.weight > 0))
    val byDomain = ws.map(w => w.domain -> w).toMap
    // fr has the largest excess → largest weight; de the smallest
    assert(byDomain("fr").weight > byDomain("en").weight)
    assert(byDomain("en").weight > byDomain("de").weight)
    // uniform start moves: fr above 1/3, de below
    assert(byDomain("fr").weight > 1.0 / 3)
    assert(byDomain("de").weight < 1.0 / 3)
  }

  test("zero rounds returns the uniform mixture; solve is deterministic") {
    val w0 = Mixture.doremiWeights(stats, rounds = 0)
    assert(w0.forall(w => w.weight == 1.0 / 3))
    val a = Mixture.doremiWeights(stats.reverse, eta = 0.25, rounds = 4)
    val b = Mixture.doremiWeights(stats, eta = 0.25, rounds = 4)
    assert(a === b) // input order irrelevant — bit-identical
  }

  test("destabilizing eta fails fast instead of going negative") {
    intercept[IllegalArgumentException] {
      Mixture.doremiWeights(stats, eta = 3.0, rounds = 4)
    }
  }

  test("mixtureSample is a pure row function: stable under repartition, " +
      "rate >= 1 keeps whole domain") {
    val docs = (0L until 600L)
      .map(i => (i, if (i % 3 == 0) "big" else "small"))
      .toDF("id", "dom")
    val st = Seq(("big", 200L, 200.0 * 900), ("small", 400L, 400.0 * 100))
    val ws = Mixture.doremiWeights(st, eta = 0.25, rounds = 4)
    // target large enough that 'big' (heavy weight) saturates at rate 1
    val target = 500.0
    val kept = Mixture.mixtureSample(docs, "id", "dom", ws, target)
    val bigRate = Mixture.domainRate(ws.find(_.domain == "big").get, target)
    if (bigRate >= 1.0)
      assert(kept.where($"dom" === "big").count() === 200L)
    val ids1 = kept.select("id").as[Long].collect().toSet
    val ids2 = Mixture.mixtureSample(docs.repartition(7), "id", "dom",
      ws, target).select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
    assert(ids1.nonEmpty && ids1.size < 600)
  }
}

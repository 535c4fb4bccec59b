package graft

import org.apache.spark.sql.functions._

import graft.ext.Retrieval
import graft.operators.PageRank

/** Hand-computed fixtures for the ranked-retrieval scorer and the
  * PageRank power iteration — the arithmetic the q84/q88 oracles state
  * only as end-to-end hashes.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark spark spark joins data"), // tf(spark)=3, dl=5
    (2L, "spark is fast"),                // tf(spark)=1, dl=3
    (3L, "ducks quack loudly here"),      // no query terms, dl=4
    (4L, "")                              // blank: 0 tokens, no postings
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed score") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark"), k = 10)
      .select($"id", $"n_terms_hit", $"score")
      .as[(Long, Long, Double)].collect().toList
    // N=4 docs, avgdl=(5+3+4+0)/4=3, df(spark)=2
    // idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    val idf = math.log(2.0)
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === List((1L, 1L, s(3, 5)), (2L, 1L, s(1, 3))))
  }

  test("bm25 k cuts on (rounded score desc, id)") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark"), k = 1).select($"id").as[Long].collect().toList
    assert(got === List(1L)) // tf=3 outranks tf=1 at equal idf
  }

  test("bm25 ignores terms absent from the corpus") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("spark", "zzz_absent"), k = 10)
      .select($"id", $"n_terms_hit").as[(Long, Long)].collect().toList
    assert(got.map(_._1) === List(1L, 2L))
    assert(got.forall(_._2 === 1L)) // the absent term hits nothing
  }

  test("rrf fusion matches the hand-computed reciprocal-rank sum") {
    // list a ranks 10 > 20; list b ranks 20 > 30:
    //   rrf(10) = 1/61, rrf(20) = 1/62 + 1/61, rrf(30) = 1/62
    val cands = Seq(
      (1L, "a", 10L, 0.9), (1L, "a", 20L, 0.8),
      (1L, "b", 20L, 0.7), (1L, "b", 30L, 0.5)
    ).toDF("qid", "src", "id", "score")
    val got = Retrieval.rrfFuse(cands, "qid", "src", "id", "score", k = 10)
      .select($"id", $"n_lists", $"rrf", $"rank")
      .as[(Long, Long, Double, Long)].collect().toList
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === List(
      (20L, 2L, r9(1.0 / 62 + 1.0 / 61), 1L),
      (10L, 1L, r9(1.0 / 61), 2L),
      (30L, 1L, r9(1.0 / 62), 3L)))
  }

  test("rrf ties break on id; k cuts after the fused ranking") {
    // ids 5 and 10 each top exactly one list: identical rrf, 5 first
    val cands = Seq(
      (1L, "a", 10L, 0.9), (1L, "b", 5L, 0.9),
      (1L, "a", 7L, 0.1) // single list, rank 2: 1/62 < 1/61
    ).toDF("qid", "src", "id", "score")
    val got = Retrieval.rrfFuse(cands, "qid", "src", "id", "score", k = 2)
      .select($"id", $"rank").as[(Long, Long)].collect().toList
    assert(got === List((5L, 1L), (10L, 2L))) // 7 (rank 3) cut by k=2
  }

  test("rrf ranks per query, never across queries") {
    val cands = Seq(
      (1L, "a", 10L, 0.9), (1L, "a", 11L, 0.8),
      (2L, "a", 10L, 0.5) // worse score, but rank 1 WITHIN qid 2
    ).toDF("qid", "src", "id", "score")
    val got = Retrieval.rrfFuse(cands, "qid", "src", "id", "score", k = 10)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 10L, 1L), (1L, 11L, 2L), (2L, 10L, 1L)))
  }

  test("pagerank: 2-cycle holds uniform, isolated node keeps teleport") {
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val pr = PageRank.run(edges, nodes, iters = 5)
      .select($"node", $"rank").as[(Long, Double)].collect().toMap
    // nodes 1,2 exchange all mass: pr = 0.05 + 0.85*pr_other converges
    // to 1/3 (uniform start IS the fixpoint: 0.05 + 0.85/3 = 1/3)
    assert(math.abs(pr(1L) - 1.0 / 3) < 1e-12)
    assert(math.abs(pr(2L) - 1.0 / 3) < 1e-12)
    // node 3 has no in-edges: teleport share only
    assert(math.abs(pr(3L) - 0.05) < 1e-12)
  }

  test("pagerank redistribution conserves mass with dangling nodes") {
    // 1 → 2 → 3, and 3 is DANGLING (no out-edges). Leaky mode bleeds
    // 3's mass each round; redistribution folds it back uniformly.
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    def massOf(redistribute: Boolean): (Map[Long, Double], Double) = {
      val m = PageRank.run(edges, nodes, iters = 4,
          redistributeDangling = redistribute)
        .select($"node", $"rank").as[(Long, Double)].collect().toMap
      (m, m.values.sum)
    }
    val (leaky, leakySum) = massOf(redistribute = false)
    val (exact, exactSum) = massOf(redistribute = true)
    assert(leakySum < 0.999, s"leaky mode should lose mass, got $leakySum")
    assert(math.abs(exactSum - 1.0) < 1e-12,
      s"redistribution must conserve total mass, got $exactSum")
    // hand-unrolled exact iteration: pr' = 0.05 + 0.85*(cin + dm/3)
    // with dm = pr(3) of the previous round
    var p = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    (1 to 4).foreach { _ =>
      val dm = p(3L) / 3
      p = Map(1L -> (0.05 + 0.85 * dm),
        2L -> (0.05 + 0.85 * (p(1L) + dm)),
        3L -> (0.05 + 0.85 * (p(2L) + dm)))
    }
    (1L to 3L).foreach { n =>
      assert(math.abs(exact(n) - p(n)) < 1e-12, s"node $n")
    }
    // ranking order is preserved between the modes on this chain
    assert(leaky.toSeq.sortBy(-_._2).map(_._1)
      === exact.toSeq.sortBy(-_._2).map(_._1))
  }

  test("pagerank: weights split contributions proportionally") {
    // 1 -> 2 (w=3), 1 -> 3 (w=1): node 2 gets 3/4 of node 1's mass
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val pr = PageRank.run(edges, nodes, iters = 1)
      .select($"node", $"rank").as[(Long, Double)].collect().toMap
    val third = 1.0 / 3
    assert(math.abs(pr(1L) - 0.15 / 3) < 1e-12)
    assert(math.abs(pr(2L) - (0.15 / 3 + 0.85 * third * 0.75)) < 1e-12)
    assert(math.abs(pr(3L) - (0.15 / 3 + 0.85 * third * 0.25)) < 1e-12)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

/** Unigram LM scoring: hand-computed smoothing arithmetic, the
  * unseen-token fallback when the model scores a different corpus, and
  * the zero-token drop.
  */
class LangModelSpec extends SparkSpec {

  import spark.implicits._

  test("add-one smoothing and cross-entropy match hand computation") {
    // corpus "a a b": c(a)=2, c(b)=1, N=3, V=2 → p(a)=3/5, p(b)=2/5
    val corpus = Seq((1L, "a a b")).toDF("doc_id", "text")
    val model = LangModel.unigramFit(corpus, "text")
    val probs = model.select($"term", exp($"logp"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(probs("a") - 0.6) < 1e-12)
    assert(math.abs(probs("b") - 0.4) < 1e-12)

    val scored = LangModel.crossEntropy(
      Seq((7L, "a b")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Double, Double)].collect()
    // row = (doc_id, n_tokens, cross_entropy, perplexity)
    assert(scored.length === 1)
    val (_, n, h, ppl) = scored.head
    val expected = -(math.log(0.6) + math.log(0.4)) / 2
    assert(n === 2L)
    assert(math.abs(h - expected) < 1e-12)
    assert(math.abs(ppl - math.exp(expected)) < 1e-12)
  }

  test("tokens unseen by the model take the smoothed unseen probability") {
    val corpus = Seq((1L, "a a b")).toDF("doc_id", "text")
    val model = LangModel.unigramFit(corpus, "text")
    val scored = LangModel.crossEntropy(
      Seq((9L, "z")).toDF("doc_id", "text"), "doc_id", "text", model)
      .select($"cross_entropy").as[Double].head()
    // unseen: p = 1 / (N + V) = 1/5
    assert(math.abs(scored - (-math.log(0.2))) < 1e-12)
  }

  test("blank documents are dropped, not scored") {
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val scored = LangModel.crossEntropy(
      Seq((1L, "a"), (2L, "   "), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", LangModel.unigramFit(corpus, "text"))
    assert(scored.select($"doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("stupid backoff: seen bigrams use the MLE, unseen back off at 0.4") {
    val fit = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // fit counts: bigrams ab:2, ba:1, bc:1; unigrams a:2 b:2 c:1
    // (N = 5, V = 3)
    val docs = Seq(
      (10L, "a b"),   // seen: S = c(ab)/c(a) = 2/2 = 1 → H = 0
      (11L, "c a"),   // unseen bigram, seen unigram: 0.4·(2+1)/8
      (12L, "z z")    // unseen everything: 0.4·(0+1)/8
    ).toDF("doc_id", "text")
    val got = LangModel.stupidBackoff(docs, "doc_id", "text", fit)
      .select($"doc_id", $"n_bigrams", $"sb_cross_entropy")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L)._3 === 0.0)
    assert(math.abs(got(11L)._3 - (-math.log(0.4 * 3 / 8.0))) < 1e-12)
    assert(math.abs(got(12L)._3 - (-math.log(0.4 * 1 / 8.0))) < 1e-12)
    // < 2 tokens → no bigram distribution → dropped
    val short = LangModel.stupidBackoff(
      Seq((1L, "a"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text", fit)
    assert(short.count() === 0L)
    // self-scoring never backs off: every score is a seen-branch MLE,
    // so cross-entropy is finite and bounded by -ln(min cb/cu)
    val self = LangModel.stupidBackoff(fit, "doc_id", "text", fit)
      .select($"sb_cross_entropy").as[Double].head()
    assert(self <= -math.log(1.0 / 2.0) + 1e-12)
  }
}

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
}

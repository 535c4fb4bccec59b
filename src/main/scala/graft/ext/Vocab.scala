package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer DEPLOYMENT — the application half of vocabulary induction
  * (q72 ranks a vocabulary; this encodes a corpus with one): ids 1..V
  * for the top-V corpus tokens, every document mapped to its ORDERED
  * id sequence with OOV → 0 — the last preprocessing step before
  * sequences feed a trainer.
  *
  * Scale shape: the vocabulary is one map-side-combined count shuffle +
  * a distributed TakeOrdered top-V; the V-row id table (bounded by the
  * CALLER'S constant, not the data) broadcasts into the encode join.
  * Encoding is posexplode → broadcast hash join → per-doc re-assembly
  * sorted by position: one shuffle on the doc id, no UDF, no window.
  */
object Vocab {

  /** The top-`vocabSize` tokens by corpus count (count desc, token asc —
    * deterministic ties) with ids 1..V: `(token, id, n)`. The top-V
    * collect is bounded by V (the broadcast-dim pattern), never corpus
    * size.
    */
  def induce(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)
      .as[(String, Long)].collect()
    top.zipWithIndex
      .map { case ((tok, n), i) => (tok, i + 1, n) }
      .toSeq.toDF("token", "id", "n")
  }

  /** Encode each document as its ordered token-id sequence under
    * `vocab` (from [[induce]] or any `(token, id)` frame): one row per
    * input doc — `(idCol, n_tokens, n_oov, ids)` with `ids` the
    * comma-joined sequence ("" for empty docs) and OOV encoded as 0.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "token")))
    val mapped = toks
      .join(broadcast(vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("id"), lit(0)).cast("int").as("tid"))
    val encoded = mapped.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("tid"))))
        .as("ps"))
      .select(col(idCol),
        size(col("ps")).cast("long").as("n_tokens"),
        size(filter(col("ps"), p => p.getField("tid") === 0))
          .cast("long").as("n_oov"),
        concat_ws(",",
          transform(col("ps"), p => p.getField("tid").cast("string")))
          .as("ids"))
    // posexplode drops token-less docs — re-attach them as empty
    // sequences (the encoder must be total over its input)
    docs.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), lit("")).as("ids"))
  }
}

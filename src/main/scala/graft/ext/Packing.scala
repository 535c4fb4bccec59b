package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining — map every document to its
  * position in the fixed-length training sequences formed by
  * concatenating the corpus in a canonical order and chunking every
  * `budget` tokens (the GPT-style "concat then slice" packing; documents
  * may straddle sequence boundaries, which `extra_seqs` counts).
  *
  * The assignment is pure integer window arithmetic over a running
  * token total — deterministic, engine-portable, and embarrassingly
  * parallel across the stream columns: the window partitions by
  * `streamCol` (e.g. language), so each stream packs independently.
  *
  * Scale: one shuffle on `streamCol` + an in-partition running sum (the
  * streaming window frame — no buffering). A single giant stream would
  * serialize into one task; at warehouse scale, pack per (stream, shard)
  * with a content-derived shard salt and offset shards by their
  * pre-aggregated totals — same arithmetic, two passes.
  */
object Packing {

  /** @param tokenCol  per-doc token count (any integer column)
    * @param budget    tokens per packed training sequence
    */
  def packAssignments(docs: DataFrame, idCol: String, streamCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    require(budget > 0)
    // Project the token count FIRST and reference only the projected
    // column afterwards: re-using the raw expression in the post-window
    // arithmetic would re-evaluate it per use (for a regex count, ~4
    // extra evals/row) and drag the text column through the shuffle —
    // only (id, stream, n_tokens) may cross the exchange.
    val base = docs.select(col(idCol), col(streamCol),
      tokenCol.cast("long").as("n_tokens"))
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("n_tokens")
    val cum = sum(n).over(w)
    val start = (cum - n).as("start_offset")
    val seqId = floor((cum - n) / lit(budget.toDouble)).cast("long")
    // sequences this doc spills into beyond its first (0 for empty docs)
    val extra = greatest(lit(0L),
      (floor((cum - 1) / lit(budget.toDouble)) - seqId).cast("long"))
    base.select(col(idCol), col(streamCol), n,
      start, seqId.as("seq_id"),
      ((cum - n) % budget).as("offset_in_seq"),
      extra.as("extra_seqs"))
  }

  /** RAG-style CHUNKING with overlap — the retrieval-side twin of
    * [[packAssignments]]: each document splits into fixed-size token
    * windows advancing by `stride` (< chunk ⟹ overlap), the universal
    * pre-embedding step of retrieval pipelines. Chunk count is the
    * closed form 1 + ceil(max(n − chunk, 0) / stride): the final chunk
    * always reaches the document's end, and no chunk starts past it —
    * so no trailing chunk is a subset of its predecessor.
    *
    * Pure per-row array arithmetic (sequence + slice inside
    * WholeStageCodegen, one explode) — no shuffle, no state; output
    * order is (id, chunk_idx). Empty docs produce zero chunks.
    */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    val t = TextFunctions.tokens(col(textCol))
    val n = size(t)
    val nChunks = when(n <= 0, lit(0))
      .otherwise(lit(1) + ceil((greatest(n - chunk, lit(0)))
        .cast("double") / stride).cast("int"))
    docs.select(col(idCol), t.as("_tk"), nChunks.as("_nc"))
      .where(col("_nc") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_idx"),
        col("_tk"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("_tk"), col("chunk_idx") * stride + 1, lit(chunk))
          .as("_ck"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_ck")).cast("long").as("chunk_tokens"),
        array_join(col("_ck"), " ").as("chunk_text"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORDER-INVARIANT DATASET CONTENT FINGERPRINT — one 60-bit value that
  * identifies a dataset's CONTENT (multiset of rows over the chosen
  * columns), independent of row order, partitioning, and file layout.
  * The training-data reproducibility primitive: fingerprint the corpus
  * a run trained on, tag the snapshot ([[graft.pipeline.Warehouse!
  * .createTag]]), and any later reader can prove bit-identity of "what
  * the model saw" with one aggregate — across engines.
  *
  * Construction: per row, the first 15 hex chars (60 bits) of
  * `md5(concat_ws('|', canonical column strings))`, parsed as a long;
  * the dataset value is the `bit_xor` fold. Chosen for PORTABILITY
  * over speed: md5/concat_ws/substr/hex-parse/bit_xor evaluate
  * bit-identically in Spark, DuckDB, Postgres, Trino — so the
  * fingerprint can be independently recomputed outside Spark (xxhash64
  * would be faster but is Spark-private). XOR makes the fold
  * order-invariant, shuffle-free (one partial agg per partition + a
  * 1-row merge) and overflow-free; like any multiset-XOR scheme, a row
  * appearing an EVEN number of times cancels — fingerprint tables
  * with a primary key or dedup first, or opt into the WEIGHTED fold
  * (`weighted = true`: SUM MOD 2^60), which weighs multiplicity at the
  * cost of a pinned overflow argument (see [[dataset]]).
  *
  * Scale shape: one codegen'd projection + partial aggregate — no
  * shuffle, no driver materialization beyond a single long.
  *
  * NULL canonicalization: `coalesce(cast(c AS string), chr(0))` — the
  * NUL sentinel keeps NULL distinct from the empty string (chr(0)
  * cannot appear in parquet string data read back as UTF-8 text
  * columns in these pipelines; callers with binary-ish strings should
  * pre-encode). Floating columns should be cast to a fixed DECIMAL by
  * the caller first — float→string formatting is the one expression
  * here that engines do NOT agree on.
  */
object Fingerprint {

  /** The per-row 60-bit key over the given columns (already-canonical
    * string rendering per the object doc). Each field is md5-hashed
    * BEFORE joining, so field boundaries are fixed-width hex and a
    * delimiter character inside a value can never shift content across
    * columns — ("a|b", "c") and ("a", "b|c") key differently (the
    * classic concat-injection alias a bare concat_ws would have).
    */
  def rowKey(cols: Seq[Column]): Column =
    conv(substring(md5(
      concat_ws("|", cols.map(c => md5(coalesce(c.cast("string"),
        lit("\u0000")))): _*)), 1, 15), 16, 10).cast("long")

  /** 2^60 − 1: the mask that reduces a (possibly wrapped) long sum to
    * the true sum mod 2^60 — see [[dataset]]'s overflow argument. */
  val Mask60: Long = (1L << 60) - 1

  /** The dataset fingerprint: fold of [[rowKey]] over `df` — `bit_xor`
    * by default, SUM MOD 2^60 with `weighted = true`. Returns 0 for an
    * empty dataset (both folds' identity).
    *
    * The weighted fold weighs row MULTIPLICITY (the XOR fold cancels
    * even-multiplicity rows) and its overflow semantics are pinned
    * cross-engine: row keys are non-negative and < 2^60, so the true
    * sum fits any 128-bit accumulator (DuckDB sums BIGINT into
    * HUGEINT, then `% 2^60` is exact), while Spark's non-ANSI long sum
    * wraps mod 2^64 — and since 2^60 DIVIDES 2^64, masking the wrapped
    * value with 2^60 − 1 recovers exactly the true sum mod 2^60. Both
    * engines land the same long, no 128-bit type needed on the Spark
    * side.
    */
  def dataset(df: DataFrame, cols: Seq[String],
      weighted: Boolean = false): Long = {
    val key = rowKey(cols.map(df.col))
    val fold =
      if (weighted) sum(key).bitwiseAND(lit(Mask60)) else bit_xor(key)
    val r = df.agg(fold.as("fp")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}

/** INCREMENTALLY MAINTAINED dataset fingerprint over a warehouse
  * table. XOR is retraction-exact and SELF-INVERSE, so the change feed
  * maintains the fingerprint for free: fold [[Fingerprint.rowKey]]
  * over EVERY feed row, sign-blind — a genuine insert XORs its key in,
  * a genuine delete XORs the same key out, an update's −old/+new pair
  * swaps them, and the −1/+1 pairs a rewrite re-emits for untouched
  * rows cancel to zero by parity. Refresh cost is therefore the
  * commits' TOUCHED FILES, never the corpus — at 100 TB, verifying
  * "the table still has exactly the content tag X pinned" is a
  * metadata read of one stored long.
  *
  * State is one row in a warehouse table (`<src>_fp` by default):
  * (cols, fp, src_version) — committed via [[graft.pipeline.Warehouse!
  * .overwrite]], so a crash leaves the old watermark and the re-run
  * folds the same feed again (idempotent: the fold is a pure function
  * of (stored version, head)). A GC'd feed (eager-GC warehouses) or a
  * column-set change falls back to one full recompute — same contract
  * as the materialized-view layer's `changeFeedReadable` fallback.
  */
object FingerprintStore {

  import org.apache.spark.sql.types._
  import graft.pipeline.Warehouse

  private def storeSpec = Warehouse.TableSpec(StructType(Seq(
    StructField("cols", StringType),
    StructField("fp", LongType),
    StructField("src_version", LongType))))

  /** Bring the stored fingerprint up to `src`'s head and return
    * (fingerprint, source version it reflects).
    *
    * Concurrency: the target version is pinned FIRST and both the feed
    * fold and the recompute fallback read exactly that snapshot — a
    * commit racing the refresh is simply the next refresh's delta,
    * never double-folded (XOR would cancel a re-folded row out; the
    * weighted fold's signed delta would subtract it back out).
    *
    * @param weighted use the SUM-MOD-2^60 fold ([[Fingerprint.dataset]]):
    *   the incremental step folds the feed SIGNED —
    *   `Σ key · _change_delta` masked to 60 bits — so deletes subtract,
    *   inserts add, and a rewrite's −1/+1 re-emissions cancel exactly
    *   like the XOR fold's parity. Weighted and XOR fingerprints keep
    *   INDEPENDENT watermark rows (the mode is part of the stored
    *   column signature).
    * @param store state-table override. The default derives from the
    *   COLUMN SET (`<src>_fp` for the full schema in spec order, else
    *   `<src>_fp_<sig>`), so differently-scoped fingerprints keep
    *   independent watermarks instead of clobbering one store into
    *   perpetual full recomputes.
    */
  def refresh(wh: Warehouse, src: String, cols: Seq[String],
      store: String = "", weighted: Boolean = false): (Long, Long) = {
    val colSig = (if (weighted) "w:" else "") + cols.mkString(",")
    val name =
      if (store.nonEmpty) store
      else if (cols == wh.tables(src).fieldNames.toSeq)
        s"${src}_fp" + (if (weighted) "_w" else "")
      else f"${src}_fp_${colSig.hashCode & 0x7fffffff}%08x"
    wh.createTable(name, storeSpec, ifNotExists = true)
    val head = wh.versions(src).max
    val cur = wh.read(name).collect().headOption
      .filter(_.getString(0) == colSig)
    val fp = cur match {
      case Some(r) if r.getLong(2) == head => return (r.getLong(1), head)
      case Some(r) if wh.changeFeedReadable(src, r.getLong(2)) =>
        val feed = wh.readChangeFeed(src, r.getLong(2), head)
        val key = Fingerprint.rowKey(cols.map(feed.col))
        if (weighted) {
          // signed fold; products and the wrapped sum reduce mod 2^60
          // exactly (2^60 | 2^64 — the dataset() overflow argument)
          val d = feed.agg(sum(key * col("_change_delta"))
            .bitwiseAND(lit(Fingerprint.Mask60)).as("d")).head()
          (r.getLong(1) + (if (d.isNullAt(0)) 0L else d.getLong(0))) &
            Fingerprint.Mask60
        } else {
          // sign-blind XOR fold of the feed — see the object doc
          val d = feed.agg(bit_xor(key).as("d")).head()
          r.getLong(1) ^ (if (d.isNullAt(0)) 0L else d.getLong(0))
        }
      case _ =>
        Fingerprint.dataset(wh.readVersion(src, head), cols, weighted)
    }
    wh.overwrite(name, singleRow(colSig, fp, head))
    (fp, head)
  }

  private def singleRow(colSig: String, fp: Long, v: Long): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(colSig, fp, v)),
      storeSpec.schema)
  }
}

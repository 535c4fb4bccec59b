package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotency / dedup primitives (SURVEY.md §2.5-2.6).
  *
  * The reference's entire exactly-once story is "check-then-write":
  * anti-join the batch against what the warehouse already has, insert
  * only the remainder (`/root/reference/README.md:36-37`;
  * `script.py:85-89,141-143,159-166`).
  *
  * Scale notes: the build side of each anti-join is either a dim table
  * or a bounded recency window of keys — small relative to the fact
  * table — so Spark picks a broadcast hash anti-join under the
  * autoBroadcastJoinThreshold and falls back to shuffled hash / sort-merge
  * anti when the key set outgrows it (AQE re-plans at runtime). Nothing
  * here ever collects to the driver.
  */
object Dedup {

  /** Rows of `batch` whose key is NOT present in `existing` (J1-J3).
    * Multi-column keys join natively — the reference's concatenated
    * string key (`script.py:163-164`) exists only because pandas `isin`
    * is single-column (F3).
    */
  def antiJoinNew(batch: DataFrame, existing: DataFrame,
      keys: Seq[String]): DataFrame =
    batch.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Deterministic first-occurrence dedup (D1) — the pinned-down form of
    * pandas `drop_duplicates(subset=...)` (`script.py:144`), which keeps
    * the first row in frame order. Spark's `dropDuplicates` keeps an
    * ARBITRARY row, so the engine uses `row_number` over an explicit
    * order instead: deterministic across runs, partitionings and engines.
    * One shuffle on `keys` (same as dropDuplicates would cost).
    */
  def keepFirst(df: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val rn = "_graft_rn"
    df.withColumn(rn,
        row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .where(col(rn) === 1)
      .drop(rn)
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.BloomKeyFilter

/** Explicit bloom-filter SEMI-JOIN PRUNING — the big-side scan filter
  * AQE's runtime filters inject opportunistically, exposed as a
  * caller-controlled operator for when the plan shape (a pre-built dim
  * batch, a multi-use key set, a non-equi downstream) keeps the
  * optimizer from doing it.
  *
  * `prunedJoin(big, small, bigKey, smallKey)` is RESULT-IDENTICAL to
  * `big.join(small, ...)`: the bloom pass may only let false positives
  * through (never drops a matching key), and the exact join that always
  * follows removes them. What changes is WHERE rows die — before the
  * big side's shuffle instead of after it. At 100 TB, a 1% selective
  * dim turns the join's exchange from O(fact) to O(matching fact): the
  * standard star-schema "filter the fact scan by the dim keys" move.
  *
  * The filter itself is built distributed (`stat.bloomFilter`
  * tree-aggregates per-partition bitmaps — one pass over the small
  * side, driver holds only the final ~`1.2 * items * ln(1/fpp)` bits)
  * and ships to executors once per stage via the codegen references
  * array.
  */
object BloomPrune {

  /** Distributed build of a bloom filter over `small`'s `key` column
    * (integral types; hashed as longs). `expectedItems <= 0` sizes the
    * filter from a count of the small side — one cheap extra job,
    * usually already answered by a cached plan or metadata.
    */
  def keyBloom(small: DataFrame, key: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems
            else math.max(small.count(), 1L)
    small.stat.bloomFilter(col(key).cast("long"), n, fpp)
  }

  /** `bloom.mightContainLong(key)` as a codegen'd Column predicate. */
  def mightContain(bloom: BloomFilter, key: Column): Column = {
    val bytes = new ByteArrayOutputStream()
    bloom.writeTo(bytes)
    GraftBridge.toColumn(
      BloomKeyFilter(GraftBridge.toExpr(key.cast("long")), bytes.toByteArray))
  }

  /** `big` restricted to rows whose `bigKey` MIGHT appear in `small`'s
    * `smallKey` set — a superset of the exact semi join, to be followed
    * by an exact join/filter on the same key.
    */
  def prune(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame =
    big.where(mightContain(keyBloom(small, smallKey, expectedItems, fpp),
      col(bigKey)))

  /** Bloom-pruned inner equi-join: result-identical to
    * `big.join(small, bigKey == smallKey)` with the big side's shuffle
    * fed only by probable matches.
    */
  def prunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame =
    prune(big, bigKey, small, smallKey, expectedItems, fpp)
      .join(small, col(bigKey) === col(smallKey))

  /** Bloom-pruned ANTI join — the check-then-write dedup shape (J1-J3)
    * at scale: rows whose key the bloom rules out are DEFINITELY new
    * and bypass the join entirely (no shuffle, no probe); only the
    * might-match slice pays the exact anti-join that removes the false
    * positives. Result-identical to `big.join(small, ..., "left_anti")`
    * for any fpp: might-contain=false proves absence (no false
    * negatives), so the fast path can never leak a duplicate.
    *
    * When the incoming batch is mostly-new (the steady state of an
    * idempotent ingest), the anti-join's big-side exchange shrinks from
    * O(batch) to O(probable dups) — the same economics as [[prunedJoin]]
    * with the keep/drop sides swapped. NULL keys match nothing in an
    * anti join and are kept; the fast path keeps them too (null
    * evaluates might-contain=false).
    */
  def prunedAntiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    val might = mightContain(keyBloom(small, smallKey, expectedItems, fpp),
      col(bigKey))
    big.where(!might).unionByName(
      big.where(might).join(small, col(bigKey) === col(smallKey),
          "left_anti"))
  }
}

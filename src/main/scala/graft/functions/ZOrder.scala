package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering key: interleaves the bits of two
  * dimensions so that sorting by the result places rows close in BOTH
  * dimensions into the same neighborhood — and therefore, after a
  * clustered rewrite, into the same files. The payoff is file skipping
  * on either dimension: a lexicographic sort by (a, b) gives tight
  * per-file min/max stats on `a` only (every file spans all of `b`),
  * while a z-sort halves each dimension's per-file span per bit of
  * file-count — 2-D selective scans skip on whichever predicate
  * arrives. This is Delta's OPTIMIZE ZORDER BY, expressed with nothing
  * but built-in bitwise expressions (fully codegen'd: 5 shift/mask
  * steps per dimension, no UDF).
  *
  * Inputs must be NON-NEGATIVE and fit in 32 bits — callers normalize
  * first (rank, clamp, or modulo; e.g. a timestamp inside a
  * date-partitioned table normalizes to seconds-of-day). Nulls sort
  * first (bitwiseAND propagates null; Spark sorts nulls first by
  * default) — acceptable for a LAYOUT key, which affects only where
  * rows land, never query results.
  */
object ZOrder {

  /** The classic parallel bit-spread: the low 32 bits of `x` move to
    * the EVEN bit positions of a long (b31..b0 → positions 62,60,..,0).
    */
  def spread32(x: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }
  }

  /** 2-D Morton code: `a`'s bits on even positions, `b`'s on odd. */
  def interleave(a: Column, b: Column): Column =
    spread32(a).bitwiseOR(shiftleft(spread32(b), 1))

  /** N-DIMENSIONAL Morton code: round-robin bit interleave of `dims`
    * (dims(0) owns bit positions 0, N, 2N, …). The 2-D fast path keeps
    * the 5-step magic-number spread; the general form assembles
    * bit-by-bit — O(bits · N) shift/mask/or expressions, still pure
    * built-ins inside WholeStageCodegen, no UDF. Each dimension
    * contributes its low `bitsPer` bits (bitsPer · N ≤ 63), so callers
    * normalize exactly as for [[interleave]]; with more dimensions,
    * fewer bits per dimension usually suffice — a LAYOUT key only needs
    * enough resolution to separate files, not rows.
    */
  def interleaveN(dims: Seq[Column], bitsPer: Int = 16): Column = {
    require(dims.nonEmpty, "interleaveN: at least one dimension")
    require(bitsPer >= 1 && bitsPer * dims.size <= 63,
      s"interleaveN: bitsPer * nDims must fit a long, got " +
        s"$bitsPer * ${dims.size}")
    if (dims.size == 1) return dims.head.cast("long")
      .bitwiseAND(lit((1L << bitsPer) - 1))
    if (dims.size == 2 && bitsPer == 16)
      return interleave(
        dims(0).cast("long").bitwiseAND(lit(0xFFFFL)),
        dims(1).cast("long").bitwiseAND(lit(0xFFFFL)))
    val n = dims.size
    val terms = for {
      (dim, d) <- dims.zipWithIndex
      bit <- 0 until bitsPer
    } yield shiftleft(
      shiftright(dim.cast("long"), bit).bitwiseAND(lit(1L)),
      bit * n + d)
    terms.reduce(_.bitwiseOR(_))
  }
}

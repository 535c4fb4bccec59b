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
}

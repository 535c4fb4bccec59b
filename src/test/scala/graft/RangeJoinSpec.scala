package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The binned keyless range join must (a) equal the naive range
  * predicate row-for-row — boundaries, negatives, degenerate and
  * bin-spanning intervals included — and (b) never plan a nested-loop
  * or cartesian join (the entire reason it exists).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, -7L), (2L, -3L), (3L, 0L), (4L, 5L), (5L, 10L), (6L, 99L),
    (7L, 100L), (8L, 101L), (9L, 250L))
    .toDF("p_id", "pt")

  private lazy val intervals = Seq(
    (10L, -10L, -5L),  // all-negative
    (11L, -2L, 7L),    // crosses zero
    (12L, 5L, 5L),     // degenerate single point
    (13L, 90L, 110L),  // spans a bin boundary at 100
    (14L, 240L, 9L),   // hi < lo: matches nothing
    (15L, 300L, 400L)) // matches nothing
    .toDF("w_id", "lo", "hi")

  private def naive =
    points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("p_id", "w_id").as[(Long, Long)].collect().toSet

  test("pointInInterval equals the naive range predicate") {
    for (w <- Seq(1L, 3L, 10L, 100L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "pt",
          intervals, "lo", "hi", binWidth = w)
        .select("p_id", "w_id").as[(Long, Long)].collect()
      assert(got.toSet === naive, s"binWidth=$w")
      assert(got.length === got.toSet.size, s"dup rows at binWidth=$w")
    }
  }

  test("pointInInterval drops null points and null/empty intervals") {
    val p = Seq(Tuple2(1L, Option(5L)), Tuple2(2L, Option.empty[Long]))
      .toDF("p_id", "pt")
    val iv = Seq((10L, Option(0L), Option(9L)), (11L, Option.empty[Long], Option(9L)))
      .toDF("w_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", 4L)
      .select("p_id", "w_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("intervalOverlap equals the naive overlap predicate, no dups") {
    val a = Seq((1L, 0L, 10L), (2L, 15L, 15L), (3L, -20L, -1L), (4L, 95L, 205L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 20L), (11L, -5L, 2L), (12L, 200L, 300L), (13L, 50L, 60L))
      .toDF("b_id", "b_lo", "b_hi")
    val want = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L)) {
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi",
          b, "b_lo", "b_hi", binWidth = w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.toSet === want, s"binWidth=$w")
      assert(got.length === got.toSet.size, s"dup rows at binWidth=$w")
    }
  }

  test("the binned plan is an equi-join, never nested-loop/cartesian") {
    val plan = RangeJoin.pointInInterval(points, "pt",
        intervals, "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // while the naive form on the same inputs IS a nested loop
    val naivePlan = points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }
}

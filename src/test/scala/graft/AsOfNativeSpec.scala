package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The native whole-operator as-of join (AsOfJoinNode → AsOfJoinStrategy
  * → AsOfJoinExec) must agree with the composed union+window form on
  * every edge case, and its plan must be the two-shuffle streaming merge
  * it claims to be.
  */
class AsOfNativeSpec extends SparkSpec {

  import spark.implicits._

  // (key, time, leftVal) — times chosen to exercise: before-any-right,
  // exact tie with right, between rights, after-all-rights, key missing
  // from right, null left time.
  private lazy val left = Seq(
    ("a", Some(5L), 1), ("a", Some(10L), 2), ("a", Some(11L), 3),
    ("a", Some(99L), 4), ("b", Some(1L), 5), ("b", Some(50L), 6),
    ("c", Some(7L), 7),                 // key absent from right
    ("a", None, 8),                     // null time matches nothing
    (null, Some(5L), 9)                 // null KEY matches nothing (SQL)
  ).toDF("k", "t", "lv")

  // (key, time, payload v) — includes a (key,time) tie (a,10) with two
  // payloads, null-time and null-key right rows, and a right-only key d.
  private lazy val right = Seq(
    ("a", Some(10L), Some(100)), ("a", Some(10L), Some(200)),
    ("a", Some(20L), Some(300)), ("b", Some(50L), Some(400)),
    ("b", None, Some(999)),             // null time: never matches
    (null, Some(1L), Some(888)),        // null key: never matches
    ("d", Some(1L), Some(500))          // right-only key: never emitted
  ).toDF("k", "t", "v")

  private def run(f: => org.apache.spark.sql.DataFrame): Set[(String, Option[Long], Int, Option[Long], Option[Int])] =
    f.select($"k", $"t", $"lv", $"asof_t", $"asof_v")
      .as[(String, Option[Long], Int, Option[Long], Option[Int])]
      .collect().toSet

  test("native as-of matches the composed operator on edge cases") {
    val composed = run(AsOfJoin.asof(left, right, Seq("k"), "t", Seq("t", "v")))
    val native = run(AsOfJoin.native(left, right, Seq("k"), "t", Seq("t", "v")))
    assert(native == composed)
    // spot-pin the semantics, not just the agreement:
    val byLv = native.map(r => r._3 -> (r._4, r._5)).toMap
    assert(byLv(1) == (None, None))                 // before any right row
    assert(byLv(2) == (Some(10L), Some(200)))       // tie: payload-max wins
    assert(byLv(3) == (Some(10L), Some(200)))       // carried forward
    assert(byLv(4) == (Some(20L), Some(300)))       // latest right
    assert(byLv(5) == (None, None))                 // b@1 before b@50
    assert(byLv(6) == (Some(50L), Some(400)))       // exact <= match
    assert(byLv(7) == (None, None))                 // key missing from right
    assert(byLv(8) == (None, None))                 // null left time
    assert(byLv(9) == (None, None))                 // null left key
  }

  test("salted as-of is row-identical to the plain form, edge cases included") {
    val plain = run(AsOfJoin.asof(left, right, Seq("k"), "t", Seq("t", "v")))
    for (s <- Seq(2, 3, 8))
      assert(run(AsOfJoin.salted(left, right, Seq("k"), "t",
        Seq("t", "v"), salts = s)) == plain, s"salts=$s")
    // and through the native whole-operator exec
    assert(run(AsOfJoin.salted(left, right, Seq("k"), "t",
      Seq("t", "v"), salts = 4, useNative = true)) == plain)
  }

  test("salted as-of agrees on a hot-key corpus and spreads the hot key") {
    // 90% of left rows share one key — the case salting exists for
    val l = (0L until 2000L).map(i =>
      (if (i % 10 == 0) s"cold${i % 7}" else "hot", i, i * 2))
      .toDF("k", "t", "lv")
    val r = (0L until 100L).map(i =>
      (if (i % 10 == 0) s"cold${i % 7}" else "hot", i * 20, i))
      .toDF("k", "t", "v")
    val plain = AsOfJoin.asof(l, r, Seq("k"), "t", Seq("v"))
      .select($"lv", $"asof_v").as[(Long, Option[Long])].collect().toSet
    val salted = AsOfJoin.salted(l, r, Seq("k"), "t", Seq("v"), salts = 8)
      .select($"lv", $"asof_v").as[(Long, Option[Long])].collect().toSet
    assert(salted == plain)
    // the hot key's left rows really do land in distinct salt buckets —
    // checked with the IMPLEMENTATION'S salt expression, not a copy
    val spread = l.where($"k" === "hot")
      .select(AsOfJoin.saltOf(l, 8).as("s"))
      .distinct().count()
    assert(spread == 8)
  }

  test("native as-of matches the composed operator on the events table") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val l = ev.where($"event_type" =!= "error")
    val r = ev.where($"event_type" === "error").select($"user_id", $"ts", $"value")
    val composed = AsOfJoin.asof(l, r, Seq("user_id"), "ts", Seq("ts", "value"), "err_")
      .select($"event_id", $"err_ts", $"err_value")
    val native = AsOfJoin.native(l, r, Seq("user_id"), "ts", Seq("ts", "value"), "err_")
      .select($"event_id", $"err_ts", $"err_value")
    assert(native.collect().toSet == composed.collect().toSet)
  }

  test("native plan is AsOfJoinExec with exactly one shuffle per side") {
    val df = AsOfJoin.native(left, right, Seq("k"), "t", Seq("t", "v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 shuffles, got $shuffles:\n$plan")
    // the composed form for comparison: union+window shuffles left+right
    // TOGETHER and runs a Window over the merged stream
    val composedPlan = AsOfJoin.asof(left, right, Seq("k"), "t", Seq("t", "v"))
      .queryExecution.executedPlan.toString
    assert(composedPlan.contains("Window"), composedPlan)
  }

  test("as-of exec survives AQE re-planning and empty partitions") {
    // 1-row left against 1-row right forces empty merge partitions on
    // most of the 4 tasks; AQE coalescing must not break zipPartitions.
    val l1 = Seq(("z", 10L, 1)).toDF("k", "t", "lv")
    val r1 = Seq(("z", 5L, 7)).toDF("k", "t", "v")
    val out = AsOfJoin.native(l1, r1, Seq("k"), "t", Seq("v"))
      .select($"lv", $"asof_v").as[(Int, Option[Int])].collect()
    assert(out.toSeq == Seq((1, Some(7))))
  }
}

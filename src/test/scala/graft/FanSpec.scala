package graft

import org.apache.spark.sql.functions._
import graft.util.Fan

/** Pins [[Fan.widen]]'s contract (r16, VERDICT item 5): a no-op —
  * the SAME DataFrame reference, zero added plan nodes — whenever the
  * input already carries at least the session parallelism, an
  * all-cores round-robin repartition otherwise, and row-set equality
  * either way.
  */
class FanSpec extends SparkSpec {
  import spark.implicits._

  test("widen is an identity no-op at >= parallelism partitions") {
    val par = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("id")
      .repartition(par + 3)
    // reference equality: no plan rewrite at all — at warehouse scale
    // (many splits) widen must add NOTHING to the plan tree
    assert(Fan.widen(wide) eq wide)
  }

  test("widen repartitions a narrow input to the session parallelism") {
    val par = spark.sparkContext.defaultParallelism
    assume(par > 1)
    val narrow = spark.range(0, 1000).toDF("id").coalesce(1)
    val widened = Fan.widen(narrow)
    assert(widened ne narrow)
    assert(widened.rdd.getNumPartitions == par)
    // row-set identical: widen only moves rows
    assert(widened.select(sum($"id")).head.getLong(0) == 999L * 1000 / 2)
    assert(widened.count() == 1000L)
  }
}

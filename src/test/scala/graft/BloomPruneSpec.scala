package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** BloomPrune contract: (1) the pruned join is result-identical to the
  * plain join for any fpp (no false negatives + exact join downstream);
  * (2) the bloom pass actually prunes (passes few non-matching rows);
  * (3) the predicate runs as a native codegen'd expression, not a UDF.
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val big = (1L to 20000L)
    .map(i => (i, s"payload-$i")).toDF("k", "payload")
  private lazy val small = (1L to 20000L).filter(_ % 100 == 0)
    .map(i => (i, s"dim-$i")).toDF("dk", "name")

  test("pruned join == plain join, even at an absurd fpp") {
    val plain = big.join(small, $"k" === $"dk")
      .select($"k", $"payload", $"name")
    for (fpp <- Seq(0.5, 0.01)) {
      val pruned = BloomPrune.prunedJoin(big, small, "k", "dk", fpp = fpp)
        .select($"k", $"payload", $"name")
      assert(pruned.collect().toSet === plain.collect().toSet)
    }
  }

  test("bloom pass is selective: near-exact row kill before the join") {
    val passed = BloomPrune.prune(big, "k", small, "dk", fpp = 0.01).count()
    val exact = 200L // 20000 / 100
    assert(passed >= exact)
    // fpp 1% over 19800 non-members: expect ~198 extras, allow 4x slack
    assert(passed <= exact + 800,
      s"bloom passed $passed rows; pruning is not happening")
  }

  test("null big-side keys are dropped, matching inner-join semantics") {
    val withNulls = big.withColumn("k",
      when($"k" % 2 === 0, $"k").otherwise(lit(null).cast("long")))
    val plain = withNulls.join(small, $"k" === $"dk").select($"k", $"name")
    val pruned = BloomPrune.prunedJoin(withNulls, small, "k", "dk")
      .select($"k", $"name")
    assert(pruned.collect().toSet === plain.collect().toSet)
  }

  test("pruned anti join == plain anti join, nulls kept, any fpp") {
    val withNulls = big.withColumn("k",
      when($"k" % 2 === 0, $"k").otherwise(lit(null).cast("long")))
    val plain = withNulls.join(small, $"k" === $"dk", "left_anti")
      .select($"k", $"payload")
    for (fpp <- Seq(0.5, 0.01)) {
      val pruned = BloomPrune.prunedAntiJoin(withNulls, small, "k", "dk",
          fpp = fpp)
        .select($"k", $"payload")
      assert(pruned.collect().toSet === plain.collect().toSet)
      assert(pruned.count() === plain.count()) // null-key rows not dup'd
    }
  }

  test("predicate is a native expression inside the scan stage") {
    // spark.range source (a Seq-backed frame constant-folds the filter
    // into its LocalTableScan, hiding the plan shape under test)
    val ranged = spark.range(1L, 20001L).toDF("k")
    val pruned = BloomPrune.prune(ranged, "k", small, "dk")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("bloom_key_filter"),
      s"bloom predicate missing from plan:\n$planStr")
    assert(!planStr.toLowerCase.contains("batchevalpython")
      && !planStr.contains("ScalaUDF"), "bloom predicate fell off codegen")
    // and it genuinely evaluates under whole-stage codegen: the plan's
    // compact form stars codegen'd operators as `*(stageId)`
    assert(planStr.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Filter bloom_key_filter")),
      s"bloom filter not inside a WholeStageCodegen stage:\n$planStr")
  }
}

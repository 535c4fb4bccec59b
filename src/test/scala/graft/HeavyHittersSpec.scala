package graft

import org.apache.spark.sql.functions._

import graft.plans.HeavyHitters

/** Misra-Gries heavy hitters: the sketch's no-false-negative guarantee
  * under partition merges, and the 2-pass exact form against a brute
  * groupBy baseline on long and string keys.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // 40% of rows on key 1, 20% on key 2, rest spread thin
  private lazy val skewed = spark.range(0L, 10000L).select(
    when($"id" % 5 < 2, lit(1L))
      .when($"id" % 5 === 2, lit(2L))
      .otherwise($"id" + 1000L).as("key"))
    .repartition(13) // force many partial sketches through merge()

  test("sketch candidates contain every item above N/(k+1)") {
    val cand = skewed.agg(HeavyHitters.candidates($"key", 10)).head()
      .getSeq[Long](0)
    // items with freq > 10000/11 ≈ 909: keys 1 (4000) and 2 (2000)
    assert(cand.contains(1L) && cand.contains(2L))
    assert(cand.size <= 10)
    // estimate-descending: the heaviest key leads
    assert(cand.head === 1L)
  }

  test("exact() matches the brute-force answer on a long key") {
    val got = HeavyHitters.exact(skewed, $"key", minShare = 0.1)
      .select($"key", $"n_rows").as[(Long, Long)].collect().toMap
    val brute = skewed.groupBy($"key").count()
      .where($"count" > 1000.0).as[(Long, Long)].collect().toMap
    assert(got === brute)
    assert(got === Map(1L -> 4000L, 2L -> 2000L))
  }

  test("exact() matches brute force on a string key with ties near the threshold") {
    val words = spark.range(0L, 1000L).select(
      when($"id" % 4 === 0, lit("alpha"))
        .when($"id" % 4 === 1, lit("beta"))
        .otherwise(concat(lit("w"), $"id")).as("w"))
    val got = HeavyHitters.exact(words, $"w", minShare = 0.2)
      .select($"key", $"n_rows").as[(String, Long)].collect().toMap
    // alpha and beta each hold exactly 25% — above 20%
    assert(got === Map("alpha" -> 250L, "beta" -> 250L))
    // share column is consistent
    val shares = HeavyHitters.exact(words, $"w", minShare = 0.2)
      .select($"share").as[Double].collect()
    assert(shares.forall(s => math.abs(s - 0.25) < 1e-12))
  }

  test("sketch folds under streaming aggregation across micro-batches") {
    // TypedImperativeAggregate state must serialize through the
    // streaming state store and merge across micro-batches — the shape
    // that makes heavy hitters usable on an unbounded event stream
    val root = java.nio.file.Files.createTempDirectory("graft-hh-stream")
    val src = s"$root/src"
    // batch 1: 60 of key 7, 40 thin; batch 2: 60 of key 9, 40 thin
    spark.range(0L, 100L).select(
        when($"id" < 60, lit(7L)).otherwise($"id" + 100L).as("key"))
      .coalesce(1).write.mode("append").parquet(src)
    spark.range(0L, 100L).select(
        when($"id" < 60, lit(9L)).otherwise($"id" + 500L).as("key"))
      .coalesce(1).write.mode("append").parquet(src)

    val q = spark.readStream.schema("key long").parquet(src)
      .agg(HeavyHitters.candidates($"key", 5).as("cand"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val cand = spark.table("hh_stream").head().getSeq[Long](0)
    // both per-batch majorities survive the cross-batch fold
    assert(cand.contains(7L) && cand.contains(9L))
    assert(cand.size <= 5)
  }

  test("mg_candidates is callable from SQL via the extension registry") {
    skewed.createOrReplaceTempView("hh_sql_t")
    val cand = spark.sql("SELECT mg_candidates(key, 10) FROM hh_sql_t")
      .head().getSeq[Long](0)
    assert(cand.contains(1L) && cand.contains(2L))
  }

  test("a strict-majority item survives k=1") {
    val maj = spark.range(0L, 999L).select(
      when($"id" % 3 =!= 0, lit(42L)).otherwise($"id").as("key"))
      .repartition(7)
    val cand = maj.agg(HeavyHitters.candidates($"key", 1)).head()
      .getSeq[Long](0)
    assert(cand === Seq(42L))
  }
}

package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.BloomAgg

/** The bloom aggregate beneath the warehouse file index: probe-encoding
  * contract, merge correctness across partitions, SQL registration, and
  * state-store serialization under streaming aggregation.
  */
class BloomAggSpec extends SparkSpec {
  import spark.implicits._

  private def readBf(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  test("bloom contains every inserted value; probe encodings match") {
    val bytes = spark.range(0L, 1000L)
      .select($"id", concat(lit("k"), $"id").as("s"))
      .repartition(8) // force partial-buffer merges
      .agg(BloomAgg.bloom($"id", 10000L, 0.01).as("b"),
        BloomAgg.bloom($"s", 10000L, 0.01).as("bs"))
      .head()
    val (bl, bs) = (readBf(bytes.getAs[Array[Byte]](0)),
      readBf(bytes.getAs[Array[Byte]](1)))
    // no false negatives, across both encodings
    (0L until 1000L).foreach { i =>
      assert(BloomAgg.mightContain(bl, i), s"long $i missing")
      assert(BloomAgg.mightContain(bs, s"k$i"), s"string k$i missing")
    }
    // int probes widen to the long encoding
    assert(BloomAgg.mightContain(bl, 42))
    // absent values: mostly rejected at fpp=1%
    val fp = (100000L until 101000L).count(BloomAgg.mightContain(bl, _))
    assert(fp < 100, s"$fp false positives in 1000 probes at fpp=0.01")
    // nulls can never be attested -> probe must keep (true)
    assert(BloomAgg.mightContain(bl, null))
  }

  test("bloom_agg is callable from SQL; nulls are skipped") {
    Seq(Some(1L), None, Some(2L)).toDF("x")
      .createOrReplaceTempView("bloom_in")
    val bytes = spark.sql(
      "SELECT bloom_agg(x, 100, 0.01) FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    val bf = readBf(bytes)
    assert(BloomAgg.mightContain(bf, 1L) && BloomAgg.mightContain(bf, 2L))
    assert(!BloomAgg.mightContain(bf, 3L))
  }

  test("bloom state folds under streaming aggregation across batches") {
    // TypedImperativeAggregate state must serialize through the
    // streaming state store and merge across micro-batches — a live
    // "seen keys" filter on an unbounded stream
    val root = java.nio.file.Files.createTempDirectory("graft-bloom-stream")
    val src = s"$root/src"
    spark.range(0L, 50L).coalesce(1).write.mode("append").parquet(src)
    spark.range(100L, 150L).coalesce(1).write.mode("append").parquet(src)
    val q = spark.readStream.schema("id long").parquet(src)
      .agg(BloomAgg.bloom($"id", 1000L, 0.01).as("b"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val bf = readBf(spark.table("bloom_stream").head()
      .getAs[Array[Byte]](0))
    // values from BOTH micro-batches survive the cross-batch fold
    assert(BloomAgg.mightContain(bf, 7L))
    assert(BloomAgg.mightContain(bf, 123L))
    assert(!BloomAgg.mightContain(bf, 777L))
  }
}

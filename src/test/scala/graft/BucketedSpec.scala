package graft

import org.apache.spark.sql.functions._

import graft.sink.BucketedSink

/** Co-located joins: two tables bucketed by the same key in the same
  * bucket count must join WITHOUT a shuffle exchange on either side.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact and dim join with zero shuffle exchanges") {
    val fact = (1 to 5000).map(i => (i % 400, i.toLong, i * 1.5))
      .toDF("norad_id", "seq", "value")
    val dim = (0 until 400).map(i => (i, s"sat$i"))
      .toDF("norad_id", "sat_name")
    BucketedSink.save(fact, "fact_bucketed", 8,
      Seq("norad_id"), Seq("norad_id"))
    BucketedSink.save(dim, "dim_bucketed", 8,
      Seq("norad_id"), Seq("norad_id"))

    // force the SMJ path (tiny test data would otherwise broadcast,
    // which hides the bucket layout this test is about)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("fact_bucketed")
        .join(spark.table("dim_bucketed"), "norad_id")
      j.collect() // finalize under AQE
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() === 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS fact_bucketed")
      spark.sql("DROP TABLE IF EXISTS dim_bucketed")
    }
  }
}

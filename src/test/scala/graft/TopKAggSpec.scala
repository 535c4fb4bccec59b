package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKAgg

/** The bounded-heap top-k aggregate: exact agreement with sort-desc,
  * associative partial merge across partitions (which also exercises
  * the serialize/deserialize path), type genericity, null skipping,
  * and the SQL registration.
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("top_k equals sort-desc-take-k, across many partitions") {
    val vals = (1 to 997).map(i => (i % 7, (i * 31) % 1000))
    val df = vals.toDF("g", "v").repartition(13)
    val got = df.groupBy($"g").agg(TopKAgg.topK($"v", 5).as("t"))
      .as[(Int, Seq[Int])].collect().toMap
    val want = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted(Ordering[Int].reverse).take(5)
    }
    assert(got === want)
  }

  test("nulls are skipped; k larger than the group returns all values") {
    val df = Seq((1, Some(3)), (1, None), (1, Some(8)), (2, None))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(TopKAgg.topK($"v", 10).as("t"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(got(1) === Seq(8, 3))
    assert(got(2) === Seq.empty)
  }

  test("orderable non-numeric types work (strings)") {
    val df = Seq((1, "pear"), (1, "apple"), (1, "zebra"), (1, "mango"))
      .toDF("g", "v").repartition(3)
    val got = df.groupBy($"g").agg(TopKAgg.topK($"v", 2).as("t"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got(1) === Seq("zebra", "pear"))
  }

  test("top_k is callable from SQL via the extension registry") {
    Seq((1, 5.0), (1, 9.0), (1, 1.0)).toDF("g", "v")
      .createOrReplaceTempView("topk_t")
    val r = spark.sql("SELECT g, top_k(v, 2) AS t FROM topk_t GROUP BY g")
      .as[(Int, Seq[Double])].collect().toMap
    assert(r(1) === Seq(9.0, 5.0))
  }

  test("the plan carries a partial aggregation (map-side heaps)") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v").repartition(4)
    val plan = df.groupBy($"g").agg(TopKAgg.topK($"v", 3).as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"), plan)
  }
}

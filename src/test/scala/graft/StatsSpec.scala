package graft

import org.apache.spark.sql.functions._

import graft.ext.Stats

/** percentileDiscrete must reproduce Spark's exact `percentile`
  * aggregate BIT-FOR-BIT — it replaces it inside oracle-gated queries,
  * so even a 1-ulp interpolation difference would flip `>=`-vs-cut
  * comparisons downstream.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def compare(rows: Seq[(String, Double)], p: Double): Unit = {
    val df = rows.toDF("g", "v")
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, cast($p as double))").as("pct"))
      .as[(String, Double)].collect().toMap
    val got = Stats.percentileDiscrete(df, Seq("g"), "v", p)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === want.keySet, s"p=$p")
    for ((k, w) <- want)
      assert(java.lang.Double.doubleToLongBits(got(k)) ===
        java.lang.Double.doubleToLongBits(w), s"p=$p group=$k: ${got(k)} != $w")
  }

  private val mixed: Seq[(String, Double)] =
    (0 until 101).map(i => ("a", (i * 37 % 101) / 100.0)) ++   // permuted grid
    (0 until 50).map(i => ("b", (i % 7) / 10.0)) ++            // heavy ties
    Seq(("c", 0.5)) ++                                          // single value
    (0 until 4).map(_ => ("d", 0.25))                           // all-equal

  test("matches percentile() bit-for-bit across p values and tie shapes") {
    for (p <- Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0))
      compare(mixed, p)
  }

  test("ignores nulls like percentile()") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = Stats.percentileDiscrete(df, Seq("g"), "v", 0.5)
      .as[(String, Double)].collect().head._2
    assert(got === 2.0) // interpolated midpoint of {1, 3}
  }

  test("a NULL group key is a real group, like percentile()") {
    val df = Seq((Option.empty[String], 1.0), (None, 3.0),
      (Option("a"), 5.0)).toDF("g", "v")
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p"))
      .as[(Option[String], Double)].collect().toMap
    val got = Stats.percentileDiscrete(df, Seq("g"), "v", 0.5)
      .as[(Option[String], Double)].collect().toMap
    assert(got === want) // null-keyed group carries its real 2.0, not null
    assert(got(None) === 2.0)
  }

  test("emits all-null groups with a null percentile, like percentile()") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("b", None))
      .toDF("g", "v")
    val got = Stats.percentileDiscrete(df, Seq("g"), "v", 0.5)
      .as[(String, Option[Double])].collect().toMap
    assert(got === Map("a" -> Some(1.0), "b" -> None))
  }

  test("aggregate state is the histogram, not the row set") {
    // 10k rows, 3 distinct values: the window input after the first
    // aggregation must be 3 rows per group, proving bounded state
    val df = (0L until 10000L).map(i => ("g", (i % 3) / 10.0)).toDF("g", "v")
    val hist = df.groupBy("g", "v").count()
    assert(hist.count() === 3)
    val got = Stats.percentileDiscrete(df, Seq("g"), "v", 0.5)
      .as[(String, Double)].collect().head._2
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)"))
      .as[(String, Double)].collect().head._2
    assert(got === want)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Native DotProduct expression + the SQL surface registered by
  * GraftExtensions (tle_bstar / tle_parse / vec_dot).
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (2L, Seq(0.5f, -1f, 2f), Seq(1f, 1f, 1f))).toDF("id", "a", "b")

  test("vec_dot equals the composable aggregate/zip_with fold bit-for-bit") {
    val composable = vecs.select(
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d"))
      .as[Double].collect()
    val native = vecs.select(Similarity.dot(col("a"), col("b")).as("d"))
      .as[Double].collect()
    assert(native.toSeq === composable.toSeq)
    assert(native(0) === 32.0) // 4 + 10 + 18
  }

  test("vec_dot null semantics: null array, null element, length mismatch") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (None, Some(Seq(3f, 4f))),
      (Some(Seq(1f, 2f, 3f)), Some(Seq(3f, 4f)))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0)) // null array
    assert(out(2).isNullAt(0)) // length mismatch
  }

  test("vec_dot runs inside WholeStageCodegen") {
    // repartition: a LocalTableScan evaluates without codegen, a real
    // exchange + project goes through WholeStageCodegen. Execute first —
    // under AQE the final plan only exists after execution.
    val df = vecs.repartition(2).select(Similarity.dot(col("a"), col("b")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` operator prefix is the WholeStageCodegen marker; a
    // fallback (interpreted) projection would print a bare `Project`
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL surface: vec_dot / tle_bstar / tle_parse resolve via extensions") {
    vecs.createOrReplaceTempView("v")
    val d = spark.sql("SELECT vec_dot(a, b) AS d FROM v WHERE id = 1")
      .as[Double].collect().head
    assert(d === 32.0)

    val b = spark.sql("SELECT tle_bstar(' 29526-4') AS b")
      .collect().head.getDouble(0)
    assert(math.abs(b - 2.9526e-5) < 1e-18)
    assert(spark.sql("SELECT tle_bstar('-11606-4')").collect().head.isNullAt(0))
    assert(spark.sql("SELECT tle_bstar_strict('-11606-4')")
      .collect().head.getDouble(0) < 0)

    val l1 = "1 44714U 19074B   26012.91667824  .00001264  00000+0  16538-3 0  9996"
    val l2 = "2 44714  53.0542 203.1424 0001452  85.3017 274.8138 15.06391571338133"
    val norad = spark.sql(
      s"SELECT tle_parse('$l1', '$l2').norad_id AS n").collect().head.getInt(0)
    assert(norad === 44714)
  }
}

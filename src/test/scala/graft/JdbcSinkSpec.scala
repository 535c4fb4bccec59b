package graft

import org.apache.spark.sql.functions._

import graft.sink.JdbcSink

/** JDBC surface against embedded Derby (the sandbox's stand-in for the
  * reference's PostgreSQL): batched append (K2-K4), scan with projection
  * and predicate pushdown (S4-S6).
  */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("append with batchsize, read back, and push filters into the scan") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, s"sat$i")).toDF("norad_id", "sat_name")
    JdbcSink.append(df, url, "dim_sats_t", batchSize = 10)

    val back = JdbcSink.read(spark, url, "dim_sats_t")
    assert(back.count() === 50)

    // S6-style filtered scan: the predicate must reach the JDBC source
    val filtered = back.where(col("norad_id") > 40).select("norad_id")
    assert(filtered.count() === 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("norad_id"),
      s"filter not pushed into JDBC scan:\n$plan")

    // K2 semantics: append is additive, not overwrite
    JdbcSink.append(df.where(col("norad_id") <= 5), url, "dim_sats_t")
    assert(JdbcSink.read(spark, url, "dim_sats_t").count() === 55)
  }
}

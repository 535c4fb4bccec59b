package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated testdata star schema
  * (see /root/repo/TESTDATA.md — TPC-H-ish tables + events/documents/
  * embeddings extension tables).
  *
  * Every query entry point receives a scale-factor directory and reads
  * through here, so schema handling (the one normalization we need: the
  * events table's nanosecond timestamps arrive as TimestampType already
  * truncated to micros by the parquet reader) lives in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      // Normalize `ts` to TimestampType (LTZ) whatever the generator
      // wrote: int64 NANOS surfaces as LongType (GraftSession sets
      // nanosAsLong) and needs integer DIV 1000 — a double division
      // would lose precision above 2^53 ns; TIMESTAMP(MICROS) without
      // UTC adjustment surfaces as TIMESTAMP_NTZ, a pure
      // reinterpretation under the session's fixed UTC zone.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else raw
  }

  /** Register all tables as temp views named after themselves, so both the
    * DataFrame API and spark.sql can address them (mirrors how the oracle
    * SQL addresses the same parquet files in DuckDB).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.Schemas

/** Parquet-backed warehouse — the sandbox stand-in for the reference's
  * PostgreSQL star schema (SURVEY.md §2.2; JDBC writer options live in
  * `graft.sink.JdbcSink` and are exercised against embedded Derby in
  * tests). Append-only, like the reference's `if_exists='append'` sinks.
  */
class Warehouse(spark: SparkSession, dir: String) {

  val tables: Map[String, StructType] = Map(
    "dim_satellites" -> Schemas.dimSatellites,
    "fact_space_weather" -> Schemas.factSpaceWeather,
    "fact_telemetry" -> Schemas.factTelemetry)

  private def path(name: String) = s"$dir/$name"

  /** K1 — idempotent bootstrap, the `CREATE TABLE IF NOT EXISTS` analog
    * (`/root/reference/script.py:77-83`). Unlike the reference (which
    * bootstraps only `fact_space_weather` and assumes the other two
    * pre-exist — §2.12.6), ALL tables are created.
    */
  def bootstrap(): Unit = tables.foreach { case (name, schema) =>
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.parquet(path(name))
  }

  def read(name: String): DataFrame =
    spark.read.schema(tables(name)).parquet(path(name))

  /** K2-K4 — append insert. Parquet has no JDBC-style `batchsize`, so
    * chunking maps to output-partition sizing: rows-per-file caps the
    * unit of write the way `chunksize=1000` caps the reference's insert
    * batches (`script.py:171`).
    */
  def append(name: String, df: DataFrame, rowsPerFile: Long = 0): Unit = {
    val w = df.write.mode("append")
    (if (rowsPerFile > 0) w.option("maxRecordsPerFile", rowsPerFile) else w)
      .parquet(path(name))
  }
}

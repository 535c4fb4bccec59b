package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DateType, StructField, StructType}

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
    // fact_telemetry is DATE-PARTITIONED on epoch_date (engine addition;
    // the reference's Postgres leans on an index instead): the 3-day
    // recent-keys scan that guards every telemetry load then prunes to
    // ~3 partitions instead of scanning all history — the difference
    // between O(days) and O(corpus) at warehouse scale.
    "fact_telemetry" -> Schemas.factTelemetry.add(
      StructField("epoch_date", DateType)))

  /** Partition-column layout per table (empty = unpartitioned). */
  val partitioning: Map[String, Seq[String]] = Map(
    "dim_satellites" -> Nil,
    "fact_space_weather" -> Nil,
    "fact_telemetry" -> Seq("epoch_date"))

  private def path(name: String) = s"$dir/$name"

  /** K1 — idempotent bootstrap, the `CREATE TABLE IF NOT EXISTS` analog
    * (`/root/reference/script.py:77-83`). Unlike the reference (which
    * bootstraps only `fact_space_weather` and assumes the other two
    * pre-exist — §2.12.6), ALL tables are created.
    */
  def bootstrap(): Unit = tables.foreach { case (name, schema) =>
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val w = empty.write
      (partitioning(name) match {
        case Nil => w
        case cols => w.partitionBy(cols: _*)
      }).parquet(path(name))
    }
  }

  def read(name: String): DataFrame =
    spark.read.schema(tables(name)).parquet(path(name))

  /** K2-K4 — append insert. Parquet has no JDBC-style `batchsize`, so
    * chunking maps to output-partition sizing: rows-per-file caps the
    * unit of write the way `chunksize=1000` caps the reference's insert
    * batches (`script.py:171`).
    *
    * Partitioned tables are REPARTITIONED BY THE PARTITION COLUMNS
    * before the write: a dynamic-partition write without it has every
    * task emit one file per partition value it happens to hold —
    * O(tasks × dates) tiny files per append (measured 32 × 365 ≈ 11k
    * for a one-year batch), which poisons every later scan with file
    * and footer overhead. Clustered, each partition directory is
    * written by exactly one task (maxRecordsPerFile still splits
    * oversized ones); a skewed hot date is exactly what AQE-less
    * `repartition(col)` handles worst, so rowsPerFile remains the cap.
    */
  def append(name: String, df: DataFrame, rowsPerFile: Long = 0): Unit = {
    val parts = partitioning(name)
    val clustered = parts match {
      case Nil => df
      case cols =>
        df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
    }
    val w0 = clustered.write.mode("append")
    val w1 = if (rowsPerFile > 0) w0.option("maxRecordsPerFile", rowsPerFile)
             else w0
    (parts match {
      case Nil => w1
      case cols => w1.partitionBy(cols: _*)
    }).parquet(path(name))
  }
}

package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.functions.TleFunctions

/** NOAA F10.7 flux JSON ingestion (S3/X3).
  *
  * Payload shape (`/root/reference/script.py:8,64-71`): one top-level
  * JSON array of `[timestamp_string, flux_string]` pairs whose FIRST
  * element is a header row — mirrored by `wholetext` read → `from_json`
  * → `posexplode` → `pos > 0` filter (the `data[1:]` skip at
  * `script.py:68`) → date-before-space + float decode.
  */
object NoaaJson {

  private val pairsType: DataType = DataType.fromDDL("array<array<string>>")

  /** JSON file → `(date_utc, f10_7_flux)` rows. */
  def decode(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(posexplode(from_json(col("value"), pairsType)))
      .where(col("pos") > 0) // header skip (script.py:68)
      .select(TleFunctions.noaaDecode(col("col")).as("r"))
      .select(col("r.date_utc").as("date_utc"),
        col("r.f10_7_flux").as("f10_7_flux"))
      .where(col("date_utc").isNotNull && col("f10_7_flux").isNotNull)
}

package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the warehouse star schema — never inferred
  * (SURVEY.md §1.3-1.4). Column set and types mirror the reference's
  * star schema: `/root/reference/README.md:18-32`, projection lists at
  * `/root/reference/script.py:144,151-155`, DDL at `script.py:78-82`.
  */
object Schemas {

  /** `dim_satellites` — one row per satellite (script.py:144). */
  val dimSatellites: StructType = StructType(Seq(
    StructField("norad_id", IntegerType, nullable = false),
    StructField("sat_name", StringType),
    StructField("intl_designator", StringType)))

  /** `fact_space_weather` — one flux reading per day (script.py:78-82). */
  val factSpaceWeather: StructType = StructType(Seq(
    StructField("date_utc", DateType, nullable = false),
    StructField("f10_7_flux", DoubleType)))

  /** `fact_telemetry` — one state vector per (norad_id, epoch_utc)
    * (script.py:151-155). `b_star_drag` nullability is load-bearing:
    * signed-mantissa B* decodes to null (§2.12.1).
    */
  val factTelemetry: StructType = StructType(Seq(
    StructField("norad_id", IntegerType, nullable = false),
    StructField("epoch_utc", TimestampType, nullable = false),
    StructField("fetched_at_utc", TimestampType),
    StructField("inclination", DoubleType),
    StructField("raan", DoubleType),
    StructField("eccentricity", DoubleType),
    StructField("arg_perigee", DoubleType),
    StructField("mean_anomaly", DoubleType),
    StructField("mean_motion", DoubleType),
    StructField("b_star_drag", DoubleType, nullable = true),
    StructField("rev_number", IntegerType)))
}

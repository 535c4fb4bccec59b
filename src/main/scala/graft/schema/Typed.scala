package graft.schema

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables
import graft.pipeline.Warehouse

/** The `Dataset[T]` face of the engine's tables — case-class encoders
  * over the same warehouse star schema ([[Schemas]]) and testdata
  * extension tables, for callers who want compile-time column
  * names/types and lambda transforms. Catalyst plans the typed and
  * untyped forms identically once declared; encoders only change the
  * user-facing API, so this façade adds zero execution cost on the
  * relational path (typed LAMBDAS, as always, opt out of codegen'd
  * expressions — use them for logic, not for filters a Column can
  * express).
  *
  * Each accessor is also a live SCHEMA CONTRACT: `as[T]` fails at
  * analysis time if the on-disk table drifts from the declared class,
  * which is exactly when a typed caller wants to find out.
  */
object Typed {

  /** `dim_satellites` (Schemas.dimSatellites). */
  final case class Satellite(
      norad_id: Int,
      sat_name: Option[String],
      intl_designator: Option[String])

  /** `fact_space_weather` (Schemas.factSpaceWeather). */
  final case class SpaceWeather(
      date_utc: Date,
      f10_7_flux: Option[Double])

  /** `fact_telemetry` as stored in the warehouse: the reference star
    * schema plus the `epoch_date` partition column. `b_star_drag` is
    * Option by design — the signed-mantissa decode quirk nulls it.
    */
  final case class Telemetry(
      norad_id: Int,
      epoch_utc: Timestamp,
      fetched_at_utc: Option[Timestamp],
      inclination: Option[Double],
      raan: Option[Double],
      eccentricity: Option[Double],
      arg_perigee: Option[Double],
      mean_anomaly: Option[Double],
      mean_motion: Option[Double],
      b_star_drag: Option[Double],
      rev_number: Option[Int],
      epoch_date: Option[Date])

  /** `documents` (TESTDATA.md). */
  final case class Doc(
      doc_id: Long,
      text: Option[String],
      lang: Option[String],
      source: Option[String],
      n_chars: Option[Long])

  /** `embeddings` (TESTDATA.md). */
  final case class Embedding(
      vec_id: Long,
      embedding: Option[Seq[Float]],
      label: Option[Int])

  def satellites(wh: Warehouse): Dataset[Satellite] = {
    val df = wh.read("dim_satellites")
    import df.sparkSession.implicits._
    df.as[Satellite]
  }

  def spaceWeather(wh: Warehouse): Dataset[SpaceWeather] = {
    val df = wh.read("fact_space_weather")
    import df.sparkSession.implicits._
    df.as[SpaceWeather]
  }

  def telemetry(wh: Warehouse): Dataset[Telemetry] = {
    val df = wh.read("fact_telemetry")
    import df.sparkSession.implicits._
    df.as[Telemetry]
  }

  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents").as[Doc]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "embeddings").as[Embedding]
  }
}

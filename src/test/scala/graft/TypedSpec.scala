package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.pipeline.Warehouse
import graft.schema.Typed

/** The Dataset[T] façade: encoders line up with the on-disk schemas
  * (an `as[T]` mismatch fails at analysis — each test IS the schema
  * contract), typed lambdas see the right values, and the relational
  * path underneath is unchanged.
  */
class TypedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("warehouse star schema round-trips through the typed accessors") {
    val dir = Files.createTempDirectory("graft-typed-").toString
    val wh = new Warehouse(spark, dir)
    wh.bootstrap()
    wh.append("dim_satellites",
      Seq((25544, "ISS (ZARYA)", "1998-067A"), (44713, "STARLINK-1007", null))
        .toDF("norad_id", "sat_name", "intl_designator"))
    wh.append("fact_space_weather",
      Seq((java.sql.Date.valueOf("2026-01-01"), Some(150.2)),
        (java.sql.Date.valueOf("2026-01-02"), None: Option[Double]))
        .toDF("date_utc", "f10_7_flux"))
    wh.append("fact_telemetry", Seq(
      (25544, ts("2026-01-01T00:00:00Z"), ts("2026-01-02T00:00:00Z"),
        51.6, 100.0, 0.0002, 90.0, 270.0, 15.5,
        None: Option[Double], // the b_star quirk: decoded to null
        1000, java.sql.Date.valueOf("2026-01-01")))
      .toDF("norad_id", "epoch_utc", "fetched_at_utc", "inclination",
        "raan", "eccentricity", "arg_perigee", "mean_anomaly",
        "mean_motion", "b_star_drag", "rev_number", "epoch_date"))

    val sats = Typed.satellites(wh).collect().sortBy(_.norad_id)
    assert(sats.map(_.norad_id).toSeq === Seq(25544, 44713))
    assert(sats.head.sat_name === Some("ISS (ZARYA)"))
    assert(sats.last.intl_designator === None)

    val wx = Typed.spaceWeather(wh).collect().sortBy(_.date_utc.toString)
    assert(wx.head.f10_7_flux === Some(150.2))
    assert(wx.last.f10_7_flux === None)

    // a typed LAMBDA over the fact table — the API the façade exists for
    val t = Typed.telemetry(wh)
      .filter(r => r.norad_id == 25544 && r.b_star_drag.isEmpty)
      .map(r => (r.norad_id, r.mean_motion.getOrElse(0.0)))
      .collect().toSeq
    assert(t === Seq((25544, 15.5)))
  }

  test("testdata extension tables load typed; relational ops compose") {
    val docs = Typed.docs(spark, "/root/testdata/sf0.001")
    val some = docs.filter(d => d.lang.contains("en") && d.doc_id < 100)
      .collect()
    assert(some.forall(_.lang === Some("en")))
    assert(docs.count() > 0)
    val emb = Typed.embeddings(spark, "/root/testdata/sf0.001")
    val v = emb.filter(_.vec_id == 0L).collect()
    assert(v.length === 1 && v.head.embedding.exists(_.nonEmpty))
  }
}

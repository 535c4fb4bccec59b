package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.pipeline.{PipelineConfig, TlePipeline}

/** Pipeline integration: idempotency (run → run again → zero new rows),
  * the 3-day dedup-horizon re-admit behavior, and the K5 quality gate.
  * Mirrors SURVEY.md §5.4.
  */
class PipelineSpec extends SparkSpec {

  /** Fixed-width TLE line builder (same layout as FIXTURES.md §A1). */
  private def mkL1(norad: Int, yy: Int, dayInt: Int, frac8: Long,
      bstar: String = " 16538-3"): String =
    f"1 $norad%05dU 19074B   $yy%02d$dayInt%03d.$frac8%08d  .00001264  00000+0 $bstar%8s 0  9996"

  private def mkL2(norad: Int): String =
    f"2 $norad%05d  53.0542 203.1424 0001452  85.3017 274.8138 15.06391571338133"

  private def triple(name: String, norad: Int, yy: Int, dayInt: Int,
      frac8: Long = 0L, bstar: String = " 16538-3"): Seq[String] =
    Seq(name, mkL1(norad, yy, dayInt, frac8, bstar), mkL2(norad))

  private val now = Timestamp.valueOf("2026-01-15 00:00:00") // == UTC (session TZ)

  // Batch: two fresh sats (epochs Jan 13/14, inside the 3-day horizon),
  // one OLD record (Jan 1, outside the horizon), a duplicate norad_id
  // (same sat, two epochs → dim keeps first), a signed-mantissa B*
  // (→ null field, record kept), one malformed triple (dropped), and a
  // trailing partial (dropped).
  private val tleText = (
    triple("SAT-1", 10001, 26, 13) ++
    triple("SAT-1", 10001, 26, 14) ++          // same sat, newer epoch
    triple("SAT-2", 10002, 26, 13, bstar = "-11606-4") ++ // null B*
    triple("SAT-OLD", 10003, 26, 1) ++         // outside dedup horizon
    Seq("SAT-BAD", "1 garbage", "2 garbage") ++
    Seq("SAT-PARTIAL", mkL1(10004, 26, 13, 0L)) // trailing partial
  ).mkString("\n")

  private val noaaJson =
    """[["time_tag","f10.7"],
      | ["2026-01-13 00:00:00","135.2"],
      | ["2026-01-14 00:00:00","141.0"]]""".stripMargin

  private def setup(): (TlePipeline, String, String) = {
    val dir = Files.createTempDirectory("graft-wh").toString
    val tle = Files.createTempDirectory("graft-in").resolve("tle.txt")
    Files.writeString(tle, tleText)
    val noaa = tle.resolveSibling("noaa.json")
    Files.writeString(noaa, noaaJson)
    (new TlePipeline(spark, PipelineConfig(dir)), tle.toString, noaa.toString)
  }

  test("bootstrap is idempotent and creates all three tables") {
    val (p, _, _) = setup()
    p.warehouse.bootstrap()
    p.warehouse.bootstrap() // second call must be a no-op, not a failure
    assert(p.warehouse.tables.keys.forall(t => p.warehouse.read(t).count() == 0))
  }

  test("first run loads weather, dims, telemetry; reruns add zero recent rows") {
    val (p, tle, noaa) = setup()
    val r1 = p.run(tle, noaa, now)
    assert(r1.weatherNew === 2)
    assert(r1.tleParsed === 4)   // 4 valid triples (bad + partial dropped)
    assert(r1.satsNew === 3)     // SAT-1 deduped to one dim row
    assert(r1.telemetryNew === 4)

    // null B* record made it through with a null field
    val t = p.warehouse.read("fact_telemetry")
    import org.apache.spark.sql.functions.col
    assert(t.where(col("norad_id") === 10002 &&
      col("b_star_drag").isNull).count() === 1)
    // dim kept the FIRST epoch's row per norad (deterministic keep-first)
    assert(p.warehouse.read("dim_satellites").count() === 3)

    // Second run, same inputs: check-then-write idempotency (README:36-37)
    val r2 = p.run(tle, noaa, now)
    assert(r2.weatherNew === 0)
    assert(r2.satsNew === 0)
    // ...EXCEPT the record older than the 3-day horizon, which the
    // bounded dedup state re-admits by design (script.py:159; §2.12.3)
    assert(r2.telemetryNew === 1)
    // re-read: a parquet DataFrame pins its file listing at read() time,
    // so `t` wouldn't see files appended afterwards
    val t2 = p.warehouse.read("fact_telemetry")
    assert(t2.where(col("norad_id") === 10003).count() === 2)
    assert(t2.count() === 5)
  }

  test("telemetry recent-keys scan prunes date partitions") {
    val (p, tle, noaa) = setup()
    p.run(tle, noaa, now)
    import org.apache.spark.sql.functions.{col, to_date, lit}
    val recent = p.warehouse.read("fact_telemetry")
      .where(col("epoch_date") >= to_date(lit("2026-01-12")))
    val plan = recent.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("epoch_date"), s"no partition pruning:\n$plan")
    // the horizon scan sees only the in-window rows (Jan 13/14), not
    // the Jan 1 partition
    assert(recent.count() === 3)
  }

  test("K5 quality gate: minRows threshold blocks small batches") {
    val (_, tle, noaa) = setup()
    val gated = new TlePipeline(spark, PipelineConfig(
      Files.createTempDirectory("graft-wh2").toString, minRows = 100))
    val r = gated.run(tle, noaa, now)
    assert(r.weatherNew === 0)
    assert(r.satsNew === 0)
    assert(r.telemetryNew === 0)
    assert(gated.warehouse.read("fact_telemetry").count() === 0)
  }
}

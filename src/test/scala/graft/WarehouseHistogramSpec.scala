package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Equi-height histograms (`ANALYZE ... FOR [ALL] COLUMNS`) — CBO's
  * skew story. The manifest already publishes exact rows/bytes, NDV
  * and min/max; histograms add WHERE the mass sits, so a range
  * predicate over a skewed column estimates its true selectivity
  * instead of the uniform assumption. Published through
  * `CatalogColumnStat.histogram` (Spark's native consumption path),
  * withheld when the live-row count drifts past the analyze basis.
  */
class WarehouseHistogramSpec extends SparkSpec {

  import spark.implicits._

  private val spec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("k", LongType),
      StructField("s", StringType))))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-hist-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    (wh, dir)
  }

  /** 90% of rows in [0, 9], 10% spread over [900, 999] — the shape
    * uniform estimation gets maximally wrong for `k > 500`. */
  private def skewed: DataFrame =
    (0L until 1000L).map(i =>
      (i, if (i < 900L) i % 10L else i, s"s$i")).toDF("id", "k", "s")

  private def filterEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.rowCount.getOrElse(
      fail("no rowCount estimate — CBO off?"))

  private def publishedHist(df: DataFrame, c: String)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] = {
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case l: LogicalRelation => l
    }.getOrElse(fail("no LogicalRelation in plan"))
    rel.catalogTable.get.stats.get.colStats.get(c).flatMap(_.histogram)
  }

  test("equi-height histograms publish to CBO and range estimates " +
    "follow the skew; the basis survives re-opens via its sidecar") {
    val (wh, dir) = fresh()
    wh.append("t", skewed)
    val uniform = filterEstimate(wh.read("t").where($"k" > 500L))
    val built = wh.analyzeColumns("t", Seq("k"))
    assert(built === Map("k" -> 64L))
    val h = publishedHist(wh.read("t"), "k").getOrElse(
      fail("histogram not published after ANALYZE"))
    assert(h.bins.length === 64)
    assert(h.height === 1000.0 / 64)
    // truth = 100 rows; uniform ≈ half the table. The histogram must
    // pull the estimate at least 2.5x toward truth.
    val hist = filterEstimate(wh.read("t").where($"k" > 500L))
    assert(uniform > BigInt(400),
      s"fixture broke: uniform estimate $uniform should be ~500")
    assert(hist * 5 / 2 < uniform,
      s"histogram estimate $hist did not improve on uniform $uniform")
    // a FRESH warehouse instance over the same directory re-reads the
    // persisted basis (no in-process state involved)
    val wh2 = Warehouse.open(spark, dir)
    assert(publishedHist(wh2.read("t"), "k").isDefined)
  }

  test("drift guard: bins are withheld once live rows leave the " +
    "analyze basis window, and re-publish after re-ANALYZE; " +
    "time travel below the basis version never sees bins") {
    val (wh, _) = fresh()
    wh.append("t", skewed)
    val v1 = wh.versions("t").max
    wh.analyzeColumns("t", Seq("k"))
    assert(publishedHist(wh.read("t"), "k").isDefined)
    // +30% stays within the 2x window
    wh.append("t", (0L until 300L).map(i => (i, i % 10L, "x"))
      .toDF("id", "k", "s"))
    assert(publishedHist(wh.read("t"), "k").isDefined)
    // 3.9x the basis rows → stale shape, bins withheld (NDV/min-max
    // keep flowing — they are manifest-maintained)
    wh.append("t", (0L until 2600L).map(i => (i, i % 10L, "x"))
      .toDF("id", "k", "s"))
    assert(publishedHist(wh.read("t"), "k").isEmpty)
    wh.analyzeColumns("t", Seq("k"))
    assert(publishedHist(wh.read("t"), "k").isDefined)
    // the basis anchors at its analyzed version: a snapshot BELOW the
    // first basis has no bins to publish
    assert(publishedHist(wh.readVersion("t", v1), "k").isEmpty)
  }

  test("axes: date and timestamp bin on the estimator's own scale " +
    "(days / micros); strings refuse; all-null columns skip; " +
    "FOR ALL COLUMNS picks exactly the supported set") {
    val dir = Files.createTempDirectory("graft-hist-").toString
    val tSpec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("d", DateType),
        StructField("ts", TimestampType),
        StructField("s", StringType),
        StructField("z", LongType)))) // stays all-null
    val wh = new Warehouse(spark, dir, specs = Map("t" -> tSpec))
    wh.bootstrap()
    wh.append("t", (0 until 200).map(i => (i.toLong,
        java.sql.Date.valueOf(s"2026-01-${i % 28 + 1}"),
        java.sql.Timestamp.from(
          java.time.Instant.parse("2026-01-01T00:00:00Z")
            .plusSeconds(i * 3600L)),
        s"s$i", Option.empty[Long]))
      .toDF("id", "d", "ts", "s", "z"))
    val built = wh.analyzeColumns("t", numBins = 8)
    // id, d, ts — s has no axis, z is all-null
    assert(built.keySet === Set("id", "d", "ts"))
    val hd = publishedHist(wh.read("t"), "d").get
    val days = java.time.LocalDate.parse("2026-01-01").toEpochDay.toDouble
    assert(hd.bins.head.lo >= days && hd.bins.last.hi <= days + 28)
    val ht = publishedHist(wh.read("t"), "ts").get
    val mic = 1767225600L * 1000000.0 // 2026-01-01T00:00:00Z micros
    assert(ht.bins.head.lo === mic)
    assert(ht.bins.last.hi === mic + 199 * 3600L * 1000000.0)
    val bad = intercept[IllegalArgumentException] {
      wh.analyzeColumns("t", Seq("s"))
    }
    assert(bad.getMessage.contains("no histogram axis"))
  }

  test("manifest min/max publish for date/timestamp stat columns with " +
    "no ANALYZE, externalized in the reading session, and a time-range " +
    "estimate follows them") {
    val dir = Files.createTempDirectory("graft-hist-").toString
    val tSpec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType),
        StructField("d", DateType))),
      statColumns = Seq("ts", "d"),
      ndvColumns = Seq("ts", "d"))
    val wh = new Warehouse(spark, dir, specs = Map("t" -> tSpec))
    wh.bootstrap()
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    wh.append("t", (0 until 1000).map(i => (i.toLong,
        java.sql.Timestamp.from(t0.plusSeconds(i * 3600L)),
        java.sql.Date.valueOf(s"2026-0${i % 9 + 1}-15")))
      .toDF("id", "ts", "d"))
    val df = wh.read("t")
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case l: LogicalRelation => l
    }.get
    val cs = rel.catalogTable.get.stats.get.colStats
    assert(cs("ts").min.isDefined && cs("ts").max.isDefined,
      "timestamp stat columns must publish manifest min/max")
    assert(cs("d").min.isDefined && cs("d").max.isDefined,
      "date stat columns must publish manifest min/max")
    // the external strings round-trip to the manifest's micros/days
    import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
    assert(CatalogColumnStat.fromExternalString(cs("ts").min.get, "ts",
      TimestampType, CatalogColumnStat.VERSION) ===
      t0.getEpochSecond * 1000000L)
    assert(CatalogColumnStat.fromExternalString(cs("d").min.get, "d",
      DateType, CatalogColumnStat.VERSION) ===
      java.time.LocalDate.parse("2026-01-15").toEpochDay.toInt)
    // and CBO range estimation on event time engages: the last ~10% of
    // the span estimates far below the row count
    val est = filterEstimate(df.where(
      $"ts" > java.sql.Timestamp.from(t0.plusSeconds(900L * 3600L))))
    assert(est > BigInt(0) && est < BigInt(300),
      s"time-range estimate $est should be ~100 of 1000")
  }

  test("SQL: ANALYZE ... FOR COLUMNS / FOR ALL COLUMNS build and " +
    "report; the plain statement keeps its old meaning") {
    val (wh, _) = fresh()
    wh.registerSql("hist_")
    wh.append("t", skewed)
    val rows = spark.sql(
      "ANALYZE TABLE hist_t COMPUTE STATISTICS FOR COLUMNS (k)").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("k", 64L)))
    val all = spark.sql(
      "ANALYZE TABLE hist_t COMPUTE STATISTICS FOR ALL COLUMNS").collect()
    assert(all.map(_.getString(0)).toSet === Set("id", "k")) // s skips
    // the pre-existing statement still runs (sidecar backfill surface)
    assert(spark.sql("ANALYZE TABLE hist_t COMPUTE STATISTICS")
      .columns.head === "files_backfilled")
    assert(publishedHist(wh.read("t"), "k").isDefined)
    // an explicit empty list is a mistake, not FOR ALL COLUMNS
    val empty = intercept[IllegalArgumentException] {
      spark.sql("ANALYZE TABLE hist_t COMPUTE STATISTICS FOR COLUMNS ()")
    }
    assert(empty.getMessage.contains("names no column"))
    // SHOW STATS prints what CBO sees: the analyzed column with its
    // basis-filled ndv/min/max/nulls and 64 bins
    val st = spark.sql("SHOW STATS hist_t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st.contains("k"), s"SHOW STATS must list k, got ${st.keys}")
    val k = st("k")
    assert(k.getLong(k.fieldIndex("histogram_bins")) === 64L)
    assert(k.getString(k.fieldIndex("min")) === "0")
    assert(k.getString(k.fieldIndex("max")) === "999")
    assert(k.getLong(k.fieldIndex("null_count")) === 0L)
    // WITH n BINS overrides the 64-bin default (replaces the basis)
    val wide = spark.sql("ANALYZE TABLE hist_t COMPUTE STATISTICS " +
      "FOR COLUMNS (k) WITH 128 BINS").collect()
    assert(wide.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("k", 128L)))
    assert(publishedHist(wh.read("t"), "k").get.bins.length === 128)
  }
}

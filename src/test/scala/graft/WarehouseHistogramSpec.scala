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
    "time travel below every basis never sees bins, while the r13 " +
    "retention keeps the prior basis serving its own snapshots") {
    val (wh, _) = fresh()
    wh.append("t", Seq((-1L, 0L, "pre")).toDF("id", "k", "s"))
    val vPre = wh.versions("t").max
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
    // a snapshot BELOW every basis has no bins to publish...
    assert(publishedHist(wh.readVersion("t", vPre), "k").isEmpty)
    // ...while the v1 basis SURVIVES the re-analyze (retain-last-2), so
    // a reader pinned at the first analyzed snapshot keeps its bins
    assert(publishedHist(wh.readVersion("t", v1), "k").isDefined)
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

  test("staleness lifecycle: DML past the drift bound flags the basis " +
    "stale, and compact auto-re-analyzes with the basis's own columns " +
    "and bin count") {
    val (wh, _) = fresh()
    wh.append("t", skewed)
    assert(wh.histogramStale("t").isEmpty, "never analyzed → None")
    wh.analyzeColumns("t", Seq("k"), numBins = 32)
    assert(wh.histogramStale("t") === Some(false))
    // +30%: inside the window — compact must NOT re-analyze
    wh.append("t", (0L until 300L).map(i => (i, i % 10L, "x"))
      .toDF("id", "k", "s"))
    assert(wh.histogramStale("t") === Some(false))
    assert(!wh.reanalyzeIfStale("t"))
    // 3.9x the basis rows: past the bound — reads are withholding,
    // the probe flags it, and maintenance repairs it
    wh.append("t", (0L until 2600L).map(i => (i, i % 10L, "x"))
      .toDF("id", "k", "s"))
    assert(wh.histogramStale("t") === Some(true))
    assert(publishedHist(wh.read("t"), "k").isEmpty, "bins withheld")
    wh.compact("t")
    assert(wh.histogramStale("t") === Some(false),
      "compact must have re-analyzed the drifted basis")
    val h = publishedHist(wh.read("t"), "k")
    assert(h.isDefined, "refreshed bins must publish again")
    assert(h.get.bins.length === 32,
      "the re-analysis must reuse the stale basis's bin count")
  }

  test("a foreign process's FIRST-ever ANALYZE surfaces at the next " +
    "version change (no lifetime-wide never-analyzed memo)") {
    val (wh, dir) = fresh()
    wh.append("t", skewed)
    val v = wh.versions("t").max
    // this read memoizes "no basis" for version v — correct, v's ask
    // already ran without bins
    assert(publishedHist(wh.read("t"), "k").isEmpty)
    // a FOREIGN process analyzes: simulate by building the basis in a
    // twin warehouse over identical data and copying the immutable
    // basis file in raw over the filesystem (no local cache touched)
    val dirB = Files.createTempDirectory("graft-hist-b-").toString
    val whB = new Warehouse(spark, dirB, specs = Map("t" -> spec))
    whB.bootstrap()
    whB.append("t", skewed)
    whB.analyzeColumns("t", Seq("k"))
    val rel = java.nio.file.Paths.get("_meta", "_hist", "t",
      f"v$v%012d.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir).resolve(rel).getParent)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dirB).resolve(rel),
      java.nio.file.Paths.get(dir).resolve(rel))
    // same version: the memoized no-basis answer stands (documented)
    assert(publishedHist(wh.read("t"), "k").isEmpty)
    // next version change: the basis is discovered — one listStatus on
    // the new version's first histogram ask, no restart needed
    wh.append("t", Seq((5000L, 5L, "x")).toDF("id", "k", "s"))
    assert(publishedHist(wh.read("t"), "k").isDefined,
      "the foreign basis must surface after a version change")
  }

  test("re-ANALYZE retains the previous basis: time travel below the " +
    "new basis still sees its bins; older bases are swept") {
    val (wh, dir) = fresh()
    wh.append("t", skewed)
    val v1 = wh.versions("t").max
    wh.analyzeColumns("t", Seq("k"), numBins = 16)
    wh.append("t", (0L until 200L).map(i => (i, i % 10L, "x"))
      .toDF("id", "k", "s"))
    val v2 = wh.versions("t").max
    wh.analyzeColumns("t", Seq("k"), numBins = 32)
    // the v1 basis survives the v2 publish: pinned readers keep bins
    assert(publishedHist(wh.readVersion("t", v1), "k")
      .exists(_.bins.length === 16))
    assert(publishedHist(wh.read("t"), "k").exists(_.bins.length === 32))
    // a third basis sweeps the first, keeps the second
    wh.append("t", (0L until 200L).map(i => (i + 9000L, i % 10L, "y"))
      .toDF("id", "k", "s"))
    wh.analyzeColumns("t", Seq("k"), numBins = 64)
    val held = new java.io.File(s"$dir/_meta/_hist/t").listFiles()
      .map(_.getName).filter(_.endsWith(".json")).sorted.toSeq
    assert(held.size === 2, s"retain exactly 2 bases, got $held")
    assert(publishedHist(wh.readVersion("t", v2), "k")
      .exists(_.bins.length === 32))
  }
}

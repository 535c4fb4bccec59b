package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ingest.{NoaaJson, TleText}

/** Pipeline configuration (SURVEY.md §2.2, §2.12.2-3).
  *
  * @param minRows   K5 quality gate: skip a write unless the batch has at
  *                  least this many rows. The reference DOCUMENTS a
  *                  minimum-row-count threshold (`README.md:39-40`) but
  *                  IMPLEMENTS only non-empty checks (`script.py:91,132,
  *                  146,169`); default 1 = the implemented behavior,
  *                  raise it for the documented one.
  * @param dedupHorizonDays telemetry dedup lookback (`script.py:159`) —
  *                  re-running with records older than the horizon can
  *                  re-insert duplicates; that bounded-state trade is the
  *                  reference's late-data policy, replicated as-is.
  */
final case class PipelineConfig(
    warehouseDir: String,
    minRows: Long = 1,
    dedupHorizonDays: Int = 3,
    chunkRows: Long = 1000,
    // Landing writers that emit one WHOLE 3-line record per text row may
    // shard the TLE landing across files without breaking triple
    // alignment; opt in here (see TleText.triples' contract). Default
    // keeps the single-payload guard.
    tleAlignedFiles: Boolean = false) {
  // F5 analog: the reference aborts when DATABASE_URL is unset
  // (script.py:101-103); here the warehouse target is the one config
  // whose absence must fail fast rather than misroute writes.
  require(warehouseDir != null && warehouseDir.nonEmpty,
    "warehouseDir is required (reference: DATABASE_URL guard)")
  require(dedupHorizonDays > 0, "dedupHorizonDays must be positive")
}

/** Result counts per stage — what the reference logs (`script.py:93,137,
  * 147,170`), returned structured instead of printed.
  */
final case class PipelineRun(
    weatherNew: Long, tleParsed: Long, satsNew: Long, telemetryNew: Long)

/** The reference's three entry points EP1-EP3 (SURVEY.md §3), composed
  * in the reference's run order: weather → dim upsert → telemetry
  * (`/root/reference/script.py:108,111,139,150`), sharing one batch
  * constant `fetched_at` (`script.py:120`).
  *
  * Every dedup is check-then-write: read existing keys, anti-join, append
  * the remainder. No overwrite, no driver-side loops; each stage is one
  * declarative plan whose anti-join broadcasts the (small) key side.
  */
class TlePipeline(spark: SparkSession, cfg: PipelineConfig) {

  val warehouse = new Warehouse(spark, cfg.warehouseDir)

  /** K5: materialize once, gate on the row count, then write without
    * recompute. Returns rows appended (0 = gate closed).
    */
  private def gatedAppend(table: String, df: DataFrame,
      chunk: Long = 0): Long = {
    val cached = df.persist()
    try {
      val n = cached.count()
      if (n >= math.max(cfg.minRows, 1)) {
        warehouse.append(table, cached, chunk)
        n
      } else 0L
    } finally { cached.unpersist(); () }
  }

  /** EP3 — space weather (`script.py:61-98`): decode JSON, anti-join on
    * `date_utc` (J1), append new days.
    */
  def runWeather(noaaJsonPath: String): Long = {
    val batch = NoaaJson.decode(spark, noaaJsonPath)
    val fresh = Dedup.antiJoinNew(
      batch, warehouse.read("fact_space_weather"), Seq("date_utc"))
    gatedAppend("fact_space_weather", fresh)
  }

  /** EP1 — dim upsert (`script.py:139-148`): new NORAD ids only (J2),
    * first-occurrence-deduped within the batch (D1, deterministic order:
    * the reference's frame order is epoch order after parse; ties broken
    * by name).
    */
  def runDimSatellites(records: DataFrame): Long =
    gatedAppend("dim_satellites", freshDimSatellites(records))

  private def freshDimSatellites(records: DataFrame): DataFrame = {
    val fresh = Dedup.antiJoinNew(
      records, warehouse.read("dim_satellites"), Seq("norad_id"))
    Dedup.keepFirst(
      fresh.select("norad_id", "sat_name", "intl_designator", "epoch_utc"),
      Seq("norad_id"), Seq(col("epoch_utc"), col("sat_name")))
      .drop("epoch_utc")
  }

  /** EP2 — telemetry load (`script.py:150-177`): project the 11 fact
    * columns (T3), anti-join on composite `(norad_id, epoch_utc)` (J3)
    * against only the last `dedupHorizonDays` of warehouse keys (S6/F4 —
    * the filter prunes the build side BEFORE the join, so the state the
    * dedup carries is bounded), chunked append (K4).
    */
  def runTelemetry(records: DataFrame, now: Timestamp): Long =
    gatedAppend("fact_telemetry", freshTelemetry(records, now),
      cfg.chunkRows)

  private def freshTelemetry(records: DataFrame, now: Timestamp): DataFrame = {
    val fact = records.select(
        "norad_id", "epoch_utc", "fetched_at_utc", "inclination", "raan",
        "eccentricity", "arg_perigee", "mean_anomaly", "mean_motion",
        "b_star_drag", "rev_number")
      .withColumn("epoch_date", to_date(col("epoch_utc")))
    val horizon = lit(now) - expr(s"INTERVAL ${cfg.dedupHorizonDays} DAYS")
    // file-skip hint: epoch_utc > horizon in manifest-stat micros — files
    // whose max epoch_utc is at or before the horizon are never opened
    // (skipping INSIDE the hot partitions the date filter keeps)
    val horizonMicros = {
      val h = now.toInstant.minus(
        java.time.Duration.ofDays(cfg.dedupHorizonDays.toLong))
      h.getEpochSecond * 1000000L + h.getNano / 1000L
    }
    val recent = warehouse.readRange("fact_telemetry", "epoch_utc",
        horizonMicros + 1, Long.MaxValue)
      // the epoch_date predicate is the PARTITION filter (prunes the
      // scan to ~horizon partitions); epoch_utc keeps the exact bound
      .where(col("epoch_date") >= to_date(horizon) &&
        col("epoch_utc") > horizon)
      .select("norad_id", "epoch_utc")
    fact.join(recent, Seq("norad_id", "epoch_utc"), "left_anti")
  }

  /** EP1+EP2 published ATOMICALLY ([[Warehouse!.appendAll]]): the dim
    * upsert and the telemetry load land as one cross-table transaction,
    * so a crash between them can never leave a referentially-stale
    * warehouse (satellites without their telemetry batch or vice
    * versa) — the integrity the reference's per-INSERT Postgres
    * transactions do NOT give across its two inserts
    * (`/root/reference/script.py:146-171`); the manifest machinery
    * makes the stronger contract cheap. Per-table K5 gating is
    * unchanged: a table whose batch misses `minRows` simply isn't a
    * transaction member.
    */
  private def runSatellitesAtomic(records: DataFrame,
      now: Timestamp): (Long, Long) = {
    val dim = freshDimSatellites(records).persist()
    val fact = freshTelemetry(records, now).persist()
    try {
      val nDim = dim.count()
      val nFact = fact.count()
      val min = math.max(cfg.minRows, 1)
      warehouse.appendAll(
        (if (nDim >= min) Seq(("dim_satellites", dim, 0L)) else Nil) ++
        (if (nFact >= min) Seq(("fact_telemetry", fact, cfg.chunkRows))
         else Nil))
      (if (nDim >= min) nDim else 0L, if (nFact >= min) nFact else 0L)
    } finally { dim.unpersist(); fact.unpersist(); () }
  }

  /** Full run in reference order. `fetchedAt` is the batch constant
    * (`script.py:120`); pass the wall clock in production, a fixed value
    * in tests.
    */
  /** Production entry: stamps the batch constant from the wall clock —
    * the `utcnow()` captured once per run (Dt3, script.py:120).
    */
  def run(tleTextPath: String, noaaJsonPath: String): PipelineRun =
    run(tleTextPath, noaaJsonPath,
      Timestamp.from(java.time.Instant.now()))

  def run(tleTextPath: String, noaaJsonPath: String,
      fetchedAt: Timestamp): PipelineRun = {
    warehouse.bootstrap()
    val weather = runWeather(noaaJsonPath)
    val records = TleText.records(spark, tleTextPath, fetchedAt,
      assumeAlignedFiles = cfg.tleAlignedFiles).persist()
    try {
      val parsed = records.count()
      // "No valid TLE records found" → skip both loads (script.py:132-134)
      if (parsed == 0) PipelineRun(weather, 0, 0, 0)
      else {
        val (satsNew, telemetryNew) =
          runSatellitesAtomic(records, fetchedAt)
        PipelineRun(weather, parsed, satsNew, telemetryNew)
      }
    } finally { records.unpersist(); () }
  }
}

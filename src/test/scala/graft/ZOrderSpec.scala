package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.pipeline.Warehouse

/** Z-order clustering: the Morton code's bit arithmetic, and the payoff
  * it exists for — after a z-clustered compaction, selective predicates
  * on EITHER clustered dimension skip files, where a lexicographic sort
  * skips on the leading dimension only.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (5L, 9L),
        (0xFFFFFFFFL, 0L))
      .toDF("a", "b")
      .select(ZOrder.interleave($"a", $"b")).as[Long].collect()
    // z(a,b): a on even bits, b on odd. z(3,1)=0b0111=7;
    // z(5,9): a=0b101 spreads to 0b10001=17, b=0b1001 spreads to
    // 0b1000001=65, shifted odd = 130; 17|130 = 147
    assert(got(0) === 0L)
    assert(got(1) === 1L)
    assert(got(2) === 2L)
    assert(got(3) === 7L)
    assert(got(4) === 147L)
    assert(got(5) === 0x5555555555555555L) // all 32 bits spread to even
  }

  test("interleaveN: round-robin bit ownership, 2-D path equivalence") {
    // 3-D: dim d owns bits d, d+3, d+6, ... — unit vectors land on
    // 1, 2, 4; value 3 in dim 0 sets bits 0 and 3 (= 9)
    val got3 = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (3L, 0L, 0L), (0L, 3L, 0L), (2L, 1L, 3L))
      .toDF("a", "b", "c")
      .select(ZOrder.interleaveN(Seq($"a", $"b", $"c"), bitsPer = 8))
      .as[Long].collect()
    assert(got3.toSeq === Seq(1L, 2L, 4L, 9L, 18L,
      // a=0b10 -> bit 3; b=0b1 -> bit 1; c=0b11 -> bits 2, 5
      8L + 2L + 4L + 32L))
    // the 2-D specialization must agree with the magic-number spread
    val pairs = Seq((5L, 9L), (1234L, 4321L), (65535L, 65535L))
    val viaN = pairs.toDF("a", "b")
      .select(ZOrder.interleaveN(Seq($"a", $"b"), bitsPer = 16))
      .as[Long].collect().toSeq
    val via2 = pairs.toDF("a", "b")
      .select(ZOrder.interleave($"a", $"b")).as[Long].collect().toSeq
    assert(viaN === via2)
    // general N-bit path (bitsPer != 16) agrees with the 2-D spread on
    // values inside the narrower budget
    val viaN8 = pairs.map { case (a, b) => (a % 256, b % 256) }
      .toDF("a", "b")
      .select(ZOrder.interleaveN(Seq($"a", $"b"), bitsPer = 8))
      .as[Long].collect().toSeq
    val via28 = pairs.map { case (a, b) => (a % 256, b % 256) }
      .toDF("a", "b")
      .select(ZOrder.interleave($"a", $"b")).as[Long].collect().toSeq
    assert(viaN8 === via28)
    intercept[IllegalArgumentException] {
      ZOrder.interleaveN(Seq($"a", $"b", $"c"), bitsPer = 32)
    }
  }

  test("z_interleave is callable from SQL via the extension registry") {
    assert(spark.sql("SELECT z_interleave(5L, 9L)").head().getLong(0) === 147L)
  }

  test("optimize(zorderBy) auto-normalizes raw dimensions from stats") {
    val base = Instant.parse("2026-01-01T00:00:00Z")
    val grid = spark.range(0L, 64L * 64L).select(
      ($"id" % 64).cast("int").as("norad_id"),
      expr(s"timestamp_micros(${base.toEpochMilli * 1000L} + (id div 64) * 60000000)")
        .as("epoch_utc"),
      lit(Timestamp.from(base)).as("fetched_at_utc"),
      lit(1.0).as("inclination"), lit(2.0).as("raan"),
      lit(3.0).as("eccentricity"), lit(4.0).as("arg_perigee"),
      lit(5.0).as("mean_anomaly"), lit(15.0).as("mean_motion"),
      lit(0.1).as("b_star_drag"), lit(100).as("rev_number"),
      lit(java.sql.Date.valueOf("2026-01-01")).as("epoch_date"))
    def filesRead(df: DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.getOrElse(-1L)
    }
    val dir = Files.createTempDirectory("graft-opt-").toString
    val wh = new Warehouse(spark, dir)
    wh.bootstrap()
    wh.append("fact_telemetry", grid)
    // both dims are DECLARED stat columns, so bounds come from the
    // manifest (no data scan); epoch_utc is raw absolute micros
    // (~1.7e18) — exactly what the caller-normalized API couldn't take
    val (_, before, after) =
      wh.optimize("fact_telemetry", Seq("norad_id", "epoch_utc"),
        rowsPerFile = 1024)
    assert(after === 4L, s"expected 4 z files, got $after (before $before)")
    // half-range predicates on EITHER dimension touch 2 of 4 files
    assert(filesRead(wh.read("fact_telemetry")
      .where($"norad_id" < 32)) === 2L)
    assert(filesRead(wh.read("fact_telemetry")
      .where($"epoch_utc" < Timestamp.from(base.plusSeconds(32 * 60)))) === 2L)
    // partition columns are rejected (already directory-pruned)
    intercept[IllegalArgumentException] {
      wh.optimize("fact_telemetry", Seq("epoch_date"))
    }
  }

  test("z-clustered compaction skips files on both dimensions") {
    val base = Instant.parse("2026-01-01T00:00:00Z")
    // a 64x64 grid over one date partition: norad 0..63, minute 0..63,
    // appended in EPOCH order so pre-compaction files are epoch-sliced
    val grid = spark.range(0L, 64L * 64L).select(
      ($"id" % 64).cast("int").as("norad_id"),
      expr(s"timestamp_micros(${base.toEpochMilli * 1000L} + (id div 64) * 60000000)")
        .as("epoch_utc"),
      lit(Timestamp.from(base)).as("fetched_at_utc"),
      lit(1.0).as("inclination"), lit(2.0).as("raan"),
      lit(3.0).as("eccentricity"), lit(4.0).as("arg_perigee"),
      lit(5.0).as("mean_anomaly"), lit(15.0).as("mean_motion"),
      lit(0.1).as("b_star_drag"), lit(100).as("rev_number"),
      lit(java.sql.Date.valueOf("2026-01-01")).as("epoch_date"))

    def filesRead(df: DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.getOrElse(-1L)
    }
    val minuteOfDay = (unix_micros($"epoch_utc")
      - lit(base.toEpochMilli * 1000L)) / 60000000L

    // --- z-ordered layout ---
    val zDir = Files.createTempDirectory("graft-zorder-").toString
    val zwh = new Warehouse(spark, zDir)
    zwh.bootstrap()
    zwh.append("fact_telemetry", grid)
    zwh.compact("fact_telemetry", rowsPerFile = 1024,
      clusterBy = Seq(ZOrder.interleave($"norad_id", minuteOfDay)))
    val zFiles = zwh.loadLatest("fact_telemetry")._2.size
    assert(zFiles === 4, s"expected 4 z files, got $zFiles")

    // 4 files along the z-curve = the four quadrants: a half-range
    // predicate on EITHER dimension touches exactly 2 of 4
    assert(filesRead(zwh.read("fact_telemetry")
      .where($"norad_id" < 32)) === 2L)
    assert(filesRead(zwh.read("fact_telemetry")
      .where($"epoch_utc" < Timestamp.from(base.plusSeconds(32 * 60)))) === 2L)
    // and a quadrant predicate (both dims) touches exactly 1
    assert(filesRead(zwh.read("fact_telemetry")
      .where($"norad_id" < 32 &&
        $"epoch_utc" < Timestamp.from(base.plusSeconds(32 * 60)))) === 1L)

    // --- lexicographic (norad, epoch) layout for contrast ---
    val lDir = Files.createTempDirectory("graft-lex-").toString
    val lwh = new Warehouse(spark, lDir)
    lwh.bootstrap()
    lwh.append("fact_telemetry", grid)
    lwh.compact("fact_telemetry", rowsPerFile = 1024,
      clusterBy = Seq($"norad_id", $"epoch_utc"))
    // leading dimension skips the same...
    assert(filesRead(lwh.read("fact_telemetry")
      .where($"norad_id" < 32)) === 2L)
    // ...but the trailing dimension spans every file: no skip at all
    assert(filesRead(lwh.read("fact_telemetry")
      .where($"epoch_utc" < Timestamp.from(base.plusSeconds(32 * 60)))) === 4L)

    // layout never changes results
    assert(zwh.read("fact_telemetry").where($"norad_id" < 32).count() ===
      32L * 64L)
    assert(zwh.read("fact_telemetry").count() === 4096L)
  }

  test("clustering depth: full-range appends decay it, the threshold " +
    "hook restores it via OPTIMIZE ZORDER, stat skipping follows, and " +
    "DESCRIBE DETAIL surfaces it") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType}
    val dir = Files.createTempDirectory("graft-cdepth-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" ->
      Warehouse.TableSpec(StructType(Seq(
        StructField("k", LongType), StructField("s", StringType))),
        statColumns = Seq("k"))))
    wh.bootstrap()
    // 4 appends, each ONE file spanning the whole k range: every point
    // lookup must open every file — depth ≈ 4
    (1 to 4).foreach { _ =>
      wh.append("t", spark.range(0L, 1000L)
        .select($"id".as("k"), lit("x").as("s")).repartition(1))
    }
    val d0 = wh.clusteringDepth("t")("k")
    assert(d0 > 3.5 && d0 <= 4.0, s"decayed depth must be ~4, got $d0")
    def filesRead(df: DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collectFirst {
        case sc: FileSourceScanExec => sc.metrics("numFiles").value
      }.getOrElse(-1L)
    }
    // decayed layout: a quarter-range predicate opens every file
    assert(filesRead(wh.read("t").where($"k" < 250L)) === 4L)
    // DESCRIBE DETAIL surfaces the metric
    wh.registerSql("cd_")
    val det = spark.sql("DESCRIBE DETAIL cd_t").head()
    val shown = det.getAs[String]("clustering_depth")
    assert(shown.startsWith("k=3.") || shown == "k=4.00",
      s"clustering_depth must surface the decay, got '$shown'")
    // under the alarm threshold: the hook is a no-op
    assert(!wh.reclusterIfDecayed("t", Seq("k"), maxDepth = 8.0))
    assert(wh.clusteringDepth("t")("k") === d0)
    // past it: OPTIMIZE ZORDER runs and the metric recovers
    assert(wh.reclusterIfDecayed("t", Seq("k"), maxDepth = 2.0))
    val d1 = wh.clusteringDepth("t")("k")
    assert(d1 <= 1.05, s"restored depth must be ~1, got $d1")
    assert(!wh.reclusterIfDecayed("t", Seq("k"), maxDepth = 2.0),
      "restored layout must not re-cluster again")
    // skipping follows the metric: re-layout into 4 disjoint-range
    // files — the same quarter-range predicate now opens exactly 1
    wh.optimize("t", Seq("k"), rowsPerFile = 1000)
    assert(wh.clusteringDepth("t")("k") <= 1.05)
    assert(filesRead(wh.read("t").where($"k" < 250L)) === 1L)
    assert(wh.read("t").count() === 4000L)
  }
}

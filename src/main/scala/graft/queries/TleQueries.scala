package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TleFunctions

/** TLE-domain operator surface (SURVEY.md §2.3-2.9, §2.12) under the
  * DuckDB correctness gate.
  *
  * The driver testdata has no TLE text, so each query SYNTHESIZES
  * fixed-width TLE-format strings deterministically from integer testdata
  * columns (format_string of ints only — Java's Formatter and DuckDB's
  * printf agree byte-for-byte on integer formats, while float formatting
  * would not round identically), parses them back through the engine's
  * expression pack, and the oracle replays the identical printf+substr
  * parse in DuckDB. Because both engines parse the same decimal strings,
  * doubles are compared RAW — string→double is correctly rounded in both.
  *
  * Covered: St1-St6 (trim/substr/concat/split), C1-C3 (casts), M1-M2
  * (pow recompose, century pivot), Dt1-Dt2 (fractional-day epoch, date
  * parse), X1-X3 (tle_bstar quirks, tle_parse, NOAA decode), T1 analog
  * (ordered triple grouping), T5 (record-null-drop), F1/F3 (anti-filters),
  * J1/J3 (anti joins on date + composite keys), D1 (deterministic
  * keep-first dedup).
  */
object TleQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- shared synth fragments (Spark side) --------------------------------
  private val k: Column = col("o_orderkey")
  private val c: Column = col("o_custkey")

  /** l1/l2 synthesis — layout mirrors FIXTURES.md §A1; every %-spec is an
    * integer or plain string so both engines render identical bytes.
    * Rows with k % 97 == 0 get an alpha NORAD field → whole-record null
    * (T5 / §2.12.4 Alpha-5 behavior).
    */
  private def noradStrFor(m: Long): Column =
    when(k % 97 === 0, lit("XXXXX"))
      .otherwise(format_string("%05d", (k * 7919) % m))

  private def noradStr: Column = noradStrFor(100000L)

  private def bstarStr: Column =
    when(k % 4 === 0, format_string(" %05d-%d", c % 100000, k % 5))
      .when(k % 4 === 1, format_string("-%05d-%d", c % 100000, k % 5)) // signed mantissa → null B*
      .when(k % 4 === 2, lit(" 00000+0"))                              // → 0.0
      .otherwise(format_string(" %05d+%d", c % 100000, k % 2))

  private def line1For(norad: Column): Column = format_string(
    "1 %5sU %-8s %02d%03d.%08d  .00000000  00000-0 %8s 0  9991",
    norad, format_string("%02d%03dA", k % 100, c % 1000),
    k % 100, k % 365 + 1, (k * 2654435761L) % 100000000L, bstarStr)

  private def line1: Column = line1For(noradStr)

  private def line2For(norad: Column): Column = format_string(
    "2 %5s %3d.%04d %3d.%04d %07d %3d.%04d %3d.%04d %2d.%08d%05d",
    norad,
    k % 180, (k * 31) % 10000,
    (k * 7) % 360, (k * 37) % 10000,
    (k * 101) % 10000000,
    (k * 11) % 360, (k * 41) % 10000,
    (k * 13) % 360, (k * 43) % 10000,
    k % 16, (k * 2654435761L) % 100000000L, k % 100000)

  private def line2: Column = line2For(noradStr)

  /** The same synthesis as SQL CTEs for the DuckDB oracle;
    * parameterized by the NORAD modulus (q23 uses 100000 = all-distinct
    * satellites; q29 uses 997 so each satellite has ~15 epochs and
    * keep-latest actually reduces).
    */
  private def synthSqlFor(m: Long): String = s"""
    WITH src AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
    synth AS (
      SELECT k,
        CASE WHEN k % 97 = 0 THEN 'XXXXX'
             ELSE printf('%05d', (k * 7919) % $m) END AS norad_str,
        CASE k % 4
          WHEN 0 THEN printf(' %05d-%d', c % 100000, k % 5)
          WHEN 1 THEN printf('-%05d-%d', c % 100000, k % 5)
          WHEN 2 THEN ' 00000+0'
          ELSE printf(' %05d+%d', c % 100000, k % 2) END AS bstar_str,
        printf('%02d%03dA', k % 100, c % 1000) AS intl_raw,
        k % 100 AS yy, k % 365 + 1 AS day_int,
        (k * 2654435761) % 100000000 AS day_frac,
        c, k % 180 AS i_a, (k * 31) % 10000 AS i_b,
        (k * 7) % 360 AS r_a, (k * 37) % 10000 AS r_b,
        (k * 101) % 10000000 AS ecc7,
        (k * 11) % 360 AS p_a, (k * 41) % 10000 AS p_b,
        (k * 13) % 360 AS m_a, (k * 43) % 10000 AS m_b,
        k % 16 AS mm_a, (k * 2654435761) % 100000000 AS mm_b,
        k % 100000 AS rev
      FROM src),
    lines AS (
      SELECT k,
        printf('1 %5sU %-8s %02d%03d.%08d  .00000000  00000-0 %8s 0  9991',
               norad_str, intl_raw, yy, day_int, day_frac, bstar_str) AS l1,
        printf('2 %5s %3d.%04d %3d.%04d %07d %3d.%04d %3d.%04d %2d.%08d%05d',
               norad_str, i_a, i_b, r_a, r_b, ecc7, p_a, p_b, m_a, m_b,
               mm_a, mm_b, rev) AS l2
      FROM synth)"""

  private def synthSql: String = synthSqlFor(100000L)

  /** tle_bstar decode replayed in DuckDB SQL over a string column expr. */
  private def bstarSql(s: String): String = s"""
    CASE WHEN contains(substr($s, length($s) - 1, 2), '-')
           OR contains(substr($s, length($s) - 1, 2), '+')
         THEN CASE WHEN TRY_CAST(substr($s, length($s) - 1, 2) AS INT) < 0
              THEN TRY_CAST('0.' || substr($s, 1, length($s) - 2) AS DOUBLE)
                   / power(10, -TRY_CAST(substr($s, length($s) - 1, 2) AS INT))
              ELSE TRY_CAST('0.' || substr($s, 1, length($s) - 2) AS DOUBLE)
                   * power(10, TRY_CAST(substr($s, length($s) - 1, 2) AS INT)) END
         ELSE TRY_CAST($s AS DOUBLE) END"""

  /** q46's synthesized landing files, cached per (JVM, sf dir): they are
    * a pure function of the testdata, so bench's warm-up + timed passes
    * measure the PIPELINE, not repeated fixture writes. The warehouse is
    * NOT cached — each q46 invocation must start from an empty one.
    */
  private def q46Landing(s: SparkSession, dir: String): (String, String) =
    Fixtures.cached(s"q46:$dir") {
      val tmp = graft.util.Scratch.dir("graft-q46-landing-")
        .toString
      // TLE landing file: one 3-line record per orders row. Whole
      // records stay contiguous within a row, so multi-part output
      // never breaks triple alignment; the warehouse fixpoint is
      // record-order-independent (keys, not positions).
      val norad = when(k % 97 === 0, lit("XXXXX"))
        .otherwise(format_string("%05d", (k * 7919) % 997))
      val l1 = format_string(
        "1 %5sU %-8s 26%03d.%08d  .00000000  00000-0 %8s 0  9991",
        norad, format_string("%02d%03dA", k % 100, c % 1000),
        k % 365 + 1, k, bstarStr)
      t(s, dir, "orders")
        .repartition(s.sparkContext.defaultParallelism)
        .select(concat_ws("\n",
          concat(lit("SAT-"), norad), l1, line2For(norad)).as("value"))
        .write.mode("overwrite").text(s"$tmp/tle")
      // NOAA landing file: ONE JSON array document (header + sorted
      // [timestamp, flux] pairs) — a single-doc write is inherently
      // one task, matching the wholetext read shape.
      val pair = array(
        date_format(date_add(to_date(lit("2026-01-01")),
          col("n_nationkey")), "yyyy-MM-dd HH:mm"),
        format_string("%d.%d", col("n_nationkey"), col("n_regionkey")))
      t(s, dir, "nation")
        .agg(to_json(concat(
          array(array(lit("time_tag"), lit("f10.7"))),
          array_sort(collect_list(pair)))).as("value"))
        .write.mode("overwrite").text(s"$tmp/noaa")
      (s"$tmp/tle", s"$tmp/noaa")
    }

  /** The q56/q74 upsert fixture: a key-unique telemetry base synthesized
    * from orders (epoch injective in o_orderkey) and an update batch
    * that replaces every 3rd key and inserts a shifted-norad copy of
    * every 11th. Returned with the `k` helper column still attached.
    */
  private def mergeFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val baseTs = lit(java.time.Instant.parse("2026-01-01T00:00:00Z")
      .toEpochMilli * 1000L)
    val fetched = lit(java.sql.Timestamp.from(
      java.time.Instant.parse("2027-01-10T00:00:00Z")))
    val epoch = timestamp_micros(
      baseTs + ((k % 40) * 86400L + k) * 1000000L)
    val base = t(s, dir, "orders").select(
      ((k * 7919) % 997).cast("int").as("norad_id"),
      epoch.as("epoch_utc"),
      fetched.as("fetched_at_utc"),
      (k % 180).cast("double").as("inclination"),
      lit(null).cast("double").as("raan"),
      lit(null).cast("double").as("eccentricity"),
      lit(null).cast("double").as("arg_perigee"),
      lit(null).cast("double").as("mean_anomaly"),
      ((k % 1600).cast("double") / 100.0).as("mean_motion"),
      when(k % 5 === 0, lit(null).cast("double"))
        .otherwise((k % 7).cast("double")).as("b_star_drag"),
      (k % 100000).cast("int").as("rev_number"),
      to_date(epoch).as("epoch_date"),
      k.as("k"))
    val updates = base.where(k % 3 === 0)
        .withColumn("mean_motion", col("mean_motion") + 100.0)
        .withColumn("rev_number", (col("rev_number") + 1).cast("int"))
      .unionByName(base.where(k % 11 === 0)
        .withColumn("norad_id", (col("norad_id") + 2000).cast("int")))
      .drop("k")
    (base, updates)
  }

  val all: Seq[Q] = Seq(

    // ---- q22: tle_bstar quirk table (X1; script.py:11-20). Six input
    // classes exercise: suffix-exponent decode, signed-mantissa → null
    // (both '-' and '+'), plain-float fallthrough, garbage → null, and
    // the " 00000+0" → 0.0 case. Raw doubles — both engines parse the
    // same strings, so values are bit-identical. ----
    Q("q22_tle_bstar_quirks",
      (s, dir) => {
        val m = c % 100000
        val e = k % 5
        val raw = when(k % 6 === 0, format_string(" %05d-%d", m, e))
          .when(k % 6 === 1, format_string("-%05d-%d", m, e))
          .when(k % 6 === 2, format_string("+%05d-%d", m, e))
          .when(k % 6 === 3, format_string("0.%06d", c % 1000000))
          .when(k % 6 === 4, lit("XXXXXXXX"))
          .otherwise(lit(" 00000+0"))
        // Materialize the synthesized fixture ONCE (localCheckpoint =
        // plan fence): without it Catalyst inlines the format_string
        // chain into every downstream reference — and pushes filters
        // containing ~20 inlined copies into the scan. Production
        // parses STORED text, so materializing the synthetic text first
        // is also the faithful shape. repartition first: the single
        // parquet file otherwise pins this CPU-bound synth to one task.
        t(s, dir, "orders")
          .repartition(s.sparkContext.defaultParallelism)
          .select(k.as("o_orderkey"), (k % 6).cast("int").as("bstar_class"),
            raw.as("raw"))
          .localCheckpoint()
          .select(col("o_orderkey"), col("bstar_class"),
            TleFunctions.tleBstar(col("raw")).as("b_star"))
          .orderBy("o_orderkey")
      },
      Some(s"""
        WITH src AS (
          SELECT o_orderkey, o_orderkey % 6 AS cls,
                 o_custkey % 100000 AS m, o_orderkey % 5 AS e,
                 o_custkey % 1000000 AS m6
          FROM orders),
        raw AS (
          SELECT o_orderkey, cls,
            trim(CASE cls
              WHEN 0 THEN printf(' %05d-%d', m, e)
              WHEN 1 THEN printf('-%05d-%d', m, e)
              WHEN 2 THEN printf('+%05d-%d', m, e)
              WHEN 3 THEN printf('0.%06d', m6)
              WHEN 4 THEN 'XXXXXXXX'
              ELSE ' 00000+0' END) AS s
          FROM src)
        SELECT o_orderkey, CAST(cls AS INT) AS bstar_class,
               ${bstarSql("s")} AS b_star
        FROM raw ORDER BY o_orderkey""")),

    // ---- q23: full tle_parse round-trip (X2 + St1-St3, C1-C2, M1-M2,
    // Dt1, T5; script.py:22-59). Synthesize both lines per orders row,
    // parse back to the 11-field struct, drop whole-record-null rows
    // (alpha NORAD every 97th key), emit epoch as epoch-micros BIGINT. ----
    Q("q23_tle_parse_roundtrip",
      (s, dir) => {
        // Synthesize each 69-char line ONCE, then fence with
        // localCheckpoint before parsing. Without the fence, predicate
        // pushdown re-inlines the synthesis into all 10 validity casts
        // of the record-null filter and pushes them into the scan
        // (~25 Formatter evaluations per row — measured 30s at sf0.1 vs
        // 0.5s fenced). Production parses stored text, so the fence is
        // also the faithful shape; repartition unlocks all cores for
        // the CPU-bound synth+parse (single-file scan = one task).
        val rec = TleFunctions.tleParse(col("l1"), col("l2"))
        t(s, dir, "orders")
          .repartition(s.sparkContext.defaultParallelism)
          .select(k.as("o_orderkey"), line1.as("l1"), line2.as("l2"))
          .localCheckpoint()
          .select(col("o_orderkey"), rec.as("r"))
          .where(col("r").isNotNull)
          .select(
            col("o_orderkey"),
            col("r.norad_id").as("norad_id"),
            col("r.intl_designator").as("intl_designator"),
            unix_micros(col("r.epoch_utc")).as("epoch_micros"),
            col("r.inclination").as("inclination"),
            col("r.raan").as("raan"),
            col("r.eccentricity").as("eccentricity"),
            col("r.arg_perigee").as("arg_perigee"),
            col("r.mean_anomaly").as("mean_anomaly"),
            col("r.mean_motion").as("mean_motion"),
            col("r.b_star_drag").as("b_star_drag"),
            col("r.rev_number").as("rev_number"))
          .orderBy("o_orderkey")
      },
      Some(s"""
        $synthSql,
        parsed AS (
          SELECT k,
            TRY_CAST(substr(l1, 3, 5) AS INT) AS norad_id,
            trim(substr(l1, 10, 8)) AS intl_designator,
            TRY_CAST(substr(l1, 19, 2) AS INT) AS epoch_year,
            TRY_CAST(substr(l1, 21, 12) AS DOUBLE) AS epoch_day,
            trim(substr(l1, 54, 8)) AS braw,
            TRY_CAST(substr(l2, 9, 8) AS DOUBLE) AS inclination,
            TRY_CAST(substr(l2, 18, 8) AS DOUBLE) AS raan,
            TRY_CAST('0.' || substr(l2, 27, 7) AS DOUBLE) AS eccentricity,
            TRY_CAST(substr(l2, 35, 8) AS DOUBLE) AS arg_perigee,
            TRY_CAST(substr(l2, 44, 8) AS DOUBLE) AS mean_anomaly,
            TRY_CAST(substr(l2, 53, 11) AS DOUBLE) AS mean_motion,
            TRY_CAST(substr(l2, 64, 5) AS INT) AS rev_number
          FROM lines)
        SELECT k AS o_orderkey, norad_id, intl_designator,
               epoch_us(make_date(CASE WHEN epoch_year < 57
                                       THEN epoch_year + 2000
                                       ELSE epoch_year + 1900 END,
                                  1, 1)::TIMESTAMP)
                 + CAST(floor((epoch_day - 1) * 86400000000) AS BIGINT)
                 AS epoch_micros,
               inclination, raan, eccentricity, arg_perigee,
               mean_anomaly, mean_motion,
               ${bstarSql("braw")} AS b_star_drag,
               rev_number
        FROM parsed
        WHERE norad_id IS NOT NULL
        ORDER BY o_orderkey""")),

    // ---- q24: ordered triple-windowing (T1 analog; script.py:123-130).
    // o_orderkey is DENSE 0..N-1 in the testdata, so the rank of a key
    // among the surviving lines (k % 7 < 5) is pure per-row arithmetic —
    // idx = 5·(k div 7) + k mod 7 — no global window, no single-task
    // stage; triple assembly then runs through the production grouper
    // (graft.ingest.TleText.groupTriples: one hash aggregation on
    // idx div 3) with the trailing partial group dropped (count == 3
    // filter — the k % 7 < 5 source filter leaves a non-multiple-of-3
    // line count at every sf). ----
    Q("q24_tle_triple_group",
      (s, dir) => {
        val idx = expr("o_orderkey DIV 7") * 5 + k % 7
        val lines = t(s, dir, "orders")
          .where(k % 7 < 5)
          .select(format_string("L%d|%d", k, c).as("line"), idx.as("idx"))
          .select(expr("idx DIV 3").as("grp"),
            (col("idx") % 3).cast("int").as("pos"), col("line"))
        graft.ingest.TleText.groupTriples(lines)
          .select(col("grp").as("group_id"), col("sat_name").as("name"),
            col("l1"), col("l2"))
          .orderBy("group_id")
      },
      Some("""
        WITH lines AS (
          SELECT printf('L%d|%d', o_orderkey, o_custkey) AS line,
                 5 * (o_orderkey // 7) + o_orderkey % 7 AS idx
          FROM orders WHERE o_orderkey % 7 < 5)
        SELECT idx // 3 AS group_id,
               max(CASE WHEN idx % 3 = 0 THEN line END) AS name,
               max(CASE WHEN idx % 3 = 1 THEN line END) AS l1,
               max(CASE WHEN idx % 3 = 2 THEN line END) AS l2
        FROM lines
        GROUP BY 1 HAVING count(*) = 3
        ORDER BY group_id""")),

    // ---- q25: NOAA JSON decode path (S3/X3; script.py:61-74). Builds
    // one JSON array document per event_type — header row first, then
    // [timestamp, flux] string pairs (mirroring the single-payload
    // wholetext shape) — then decodes it back: from_json → posexplode →
    // header skip (pos > 0) → split-date + float cast. The oracle
    // computes the fixpoint directly from the base columns. ----
    Q("q25_noaa_decode",
      (s, dir) => {
        val pair = array(
          date_format(col("ts"), "yyyy-MM-dd HH:mm"),
          format_string("%d.%d", col("user_id") % 1000, col("event_id") % 100))
        val docs = t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(to_json(concat(
            array(array(lit("time_tag"), lit("f10.7"))),
            array_sort(collect_list(pair)))).as("payload"))
        val dec = TleFunctions.noaaDecode(col("col"))
        docs
          .select(col("event_type"),
            posexplode(from_json(col("payload"),
              org.apache.spark.sql.types.DataType.fromDDL("array<array<string>>"))))
          .where(col("pos") > 0)
          .select(col("event_type"),
            dec.getField("date_utc").as("date_utc"),
            dec.getField("f10_7_flux").as("f10_7_flux"))
          .orderBy("event_type", "date_utc", "f10_7_flux")
      },
      Some("""
        SELECT event_type, CAST(ts AS DATE) AS date_utc,
               CAST(printf('%d.%d', user_id % 1000, event_id % 100) AS DOUBLE)
                 AS f10_7_flux
        FROM events
        ORDER BY event_type, date_utc, f10_7_flux""")),

    // ---- q26: composite-key anti-join dedup + deterministic keep-first
    // (J3/F3 + D1; script.py:159-167, 144). batch ANTI recent on
    // (norad_id, epoch_micros) — the decoy rows (epoch + 1) prove the
    // epoch participates in the key — then first-per-norad via
    // row_number, the deterministic form of drop_duplicates(subset). ----
    Q("q26_telemetry_antijoin_dedup",
      (s, dir) => {
        val base = t(s, dir, "orders").select(
          k.as("k"),
          (k % 500).as("norad_id"),
          (lit(1700000000000000L) + expr("o_orderkey DIV 500") * 3600000000L)
            .as("epoch_micros"))
        val recent = base.where(col("k") % 3 === 0)
          .select(col("norad_id"), col("epoch_micros"))
          .unionAll(base.where(col("k") % 5 === 1)
            .select(col("norad_id"), (col("epoch_micros") + 1).as("epoch_micros")))
        val rn = row_number().over(
          Window.partitionBy("norad_id").orderBy("epoch_micros", "k"))
        base.join(recent, Seq("norad_id", "epoch_micros"), "left_anti")
          .withColumn("rn", rn).where(col("rn") === 1).drop("rn")
          .select(col("norad_id"), col("epoch_micros"), col("k"))
          .orderBy("norad_id")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k, o_orderkey % 500 AS norad_id,
                 1700000000000000 + (o_orderkey // 500) * 3600000000
                   AS epoch_micros
          FROM orders),
        recent AS (
          SELECT norad_id, epoch_micros FROM base WHERE k % 3 = 0
          UNION ALL
          SELECT norad_id, epoch_micros + 1 FROM base WHERE k % 5 = 1),
        survivors AS (
          SELECT b.* FROM base b
          ANTI JOIN recent r
            ON b.norad_id = r.norad_id AND b.epoch_micros = r.epoch_micros)
        SELECT norad_id, epoch_micros, k FROM survivors
        QUALIFY row_number() OVER (PARTITION BY norad_id
                                   ORDER BY epoch_micros, k) = 1
        ORDER BY norad_id""")),

    // ---- q29: the SURVEY §7 flagship — "newest orbital state per
    // satellite": synthesize + parse TLE pairs, keep the latest epoch
    // per norad_id (window keep-last), emit the state vector with the
    // dim attributes. One parse projection + one shuffle on norad_id. ----
    Q("q29_latest_state_per_sat",
      (s, dir) => {
        val rec = TleFunctions.tleParse(col("l1"), col("l2"))
        val norad997 = noradStrFor(997L) // ~15 epochs per satellite
        val parsed = t(s, dir, "orders")
          .repartition(s.sparkContext.defaultParallelism)
          .select(k.as("o_orderkey"), line1For(norad997).as("l1"),
            line2For(norad997).as("l2"))
          .localCheckpoint()
          .select(col("o_orderkey"), rec.as("r"))
          .where(col("r").isNotNull)
          .select(col("o_orderkey"), col("r.norad_id").as("norad_id"),
            col("r.intl_designator").as("intl_designator"),
            unix_micros(col("r.epoch_utc")).as("epoch_micros"),
            col("r.mean_motion").as("mean_motion"),
            col("r.inclination").as("inclination"))
        val rn = row_number().over(
          Window.partitionBy("norad_id")
            .orderBy(col("epoch_micros").desc, col("o_orderkey")))
        parsed.withColumn("rn", rn).where(col("rn") === 1).drop("rn")
          .select("norad_id", "intl_designator", "epoch_micros",
            "mean_motion", "inclination")
          .orderBy("norad_id")
      },
      Some(s"""
        ${synthSqlFor(997L)},
        parsed AS (
          SELECT k,
            TRY_CAST(substr(l1, 3, 5) AS INT) AS norad_id,
            trim(substr(l1, 10, 8)) AS intl_designator,
            TRY_CAST(substr(l1, 19, 2) AS INT) AS epoch_year,
            TRY_CAST(substr(l1, 21, 12) AS DOUBLE) AS epoch_day,
            TRY_CAST(substr(l2, 53, 11) AS DOUBLE) AS mean_motion,
            TRY_CAST(substr(l2, 9, 8) AS DOUBLE) AS inclination
          FROM lines),
        final AS (
          SELECT k, norad_id, intl_designator,
                 epoch_us(make_date(CASE WHEN epoch_year < 57
                                         THEN epoch_year + 2000
                                         ELSE epoch_year + 1900 END,
                                    1, 1)::TIMESTAMP)
                   + CAST(floor((epoch_day - 1) * 86400000000) AS BIGINT)
                   AS epoch_micros,
                 mean_motion, inclination
          FROM parsed WHERE norad_id IS NOT NULL)
        SELECT norad_id, intl_designator, epoch_micros, mean_motion,
               inclination
        FROM final
        QUALIFY row_number() OVER (PARTITION BY norad_id
                                   ORDER BY epoch_micros DESC, k) = 1
        ORDER BY norad_id""")),

    // ---- q47: the FLAGSHIP star join (SURVEY §7 build-order item 2;
    // /root/reference/README.md:30-31): newest orbital state per
    // satellite JOINED to the dim_satellites-shaped frame on norad_id,
    // emitting sat_name — the fact↔dim equi-join the star schema exists
    // for. The dim side (one row per satellite, name keyed off the id)
    // is derived from the same testdata; it is |satellites|-sized, so it
    // BROADCASTS (asserted in PlanAuditSpec) — at warehouse scale the
    // dim never shuffles the fact side. ----
    Q("q47_latest_state_dim_join",
      (s, dir) => {
        val rec = TleFunctions.tleParse(col("l1"), col("l2"))
        val norad997 = noradStrFor(997L)
        val dim = t(s, dir, "orders")
          .select(((k * 7919) % 997).cast("int").as("norad_id"))
          .distinct()
          .withColumn("sat_name", format_string("SAT-%05d", col("norad_id")))
        val parsed = t(s, dir, "orders")
          .repartition(s.sparkContext.defaultParallelism)
          .select(k.as("o_orderkey"), line1For(norad997).as("l1"),
            line2For(norad997).as("l2"))
          .localCheckpoint()
          .select(col("o_orderkey"), rec.as("r"))
          .where(col("r").isNotNull)
          .select(col("o_orderkey"), col("r.norad_id").as("norad_id"),
            unix_micros(col("r.epoch_utc")).as("epoch_micros"),
            col("r.mean_motion").as("mean_motion"),
            col("r.inclination").as("inclination"))
        val rn = row_number().over(
          Window.partitionBy("norad_id")
            .orderBy(col("epoch_micros").desc, col("o_orderkey")))
        parsed.withColumn("rn", rn).where(col("rn") === 1).drop("rn")
          .join(broadcast(dim), Seq("norad_id"))
          .select("norad_id", "sat_name", "epoch_micros",
            "mean_motion", "inclination")
          .orderBy("norad_id")
      },
      Some(s"""
        ${synthSqlFor(997L)},
        dim AS (
          SELECT norad_id, printf('SAT-%05d', norad_id) AS sat_name
          FROM (SELECT DISTINCT CAST((o_orderkey * 7919) % 997 AS INT)
                  AS norad_id FROM orders)),
        parsed AS (
          SELECT k,
            TRY_CAST(substr(l1, 3, 5) AS INT) AS norad_id,
            TRY_CAST(substr(l1, 19, 2) AS INT) AS epoch_year,
            TRY_CAST(substr(l1, 21, 12) AS DOUBLE) AS epoch_day,
            TRY_CAST(substr(l2, 53, 11) AS DOUBLE) AS mean_motion,
            TRY_CAST(substr(l2, 9, 8) AS DOUBLE) AS inclination
          FROM lines),
        latest AS (
          SELECT k, norad_id,
                 epoch_us(make_date(CASE WHEN epoch_year < 57
                                         THEN epoch_year + 2000
                                         ELSE epoch_year + 1900 END,
                                    1, 1)::TIMESTAMP)
                   + CAST(floor((epoch_day - 1) * 86400000000) AS BIGINT)
                   AS epoch_micros,
                 mean_motion, inclination
          FROM parsed WHERE norad_id IS NOT NULL
          QUALIFY row_number() OVER (PARTITION BY norad_id
                                     ORDER BY epoch_micros DESC, k) = 1)
        SELECT l.norad_id, d.sat_name, l.epoch_micros, l.mean_motion,
               l.inclination
        FROM latest l JOIN dim d USING (norad_id)
        ORDER BY norad_id""")),

    // ---- q28: two-phase salted aggregation over a skewed key space
    // (3 return-flag values across all of lineitem — every row lands on
    // one of 3 reducers unsalted). Salt = content-derived hash mod 16:
    // partial combine spreads each hot key over 16 reducers, final
    // combine folds 16 rows/key. Result identical to the plain GROUP BY
    // — which is exactly what the oracle checks. ----
    Q("q28_salted_skew_agg",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        graft.operators.Salted.aggregate(
            l.select(col("l_returnflag"), col("l_quantity"),
              col("l_orderkey")),
            keys = Seq("l_returnflag"),
            salt = graft.operators.Salted.saltOf(16, col("l_orderkey")),
            buckets = 16,
            aggs = Map("l_quantity" -> "sum"))
          .select(col("l_returnflag"),
            round(col("l_quantity"), 2).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q27: date-key anti-filter (J1/F1; script.py:85-89): new
    // weather dates = batch dates ANTI existing dates. Dates synthesized
    // from integer offsets so every scale factor yields 15 survivors. ----
    Q("q27_weather_date_anti",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val batch = o.select(date_add(to_date(lit("2026-01-01")),
          (k % 60).cast("int")).as("date_utc")).distinct()
        val existing = o.select(date_add(to_date(lit("2026-01-01")),
          (c % 45).cast("int")).as("date_utc")).distinct()
        batch.join(existing, Seq("date_utc"), "left_anti")
          .orderBy("date_utc")
      },
      Some("""
        WITH batch AS (
          SELECT DISTINCT DATE '2026-01-01' + CAST(o_orderkey % 60 AS INT)
            AS date_utc FROM orders),
        existing AS (
          SELECT DISTINCT DATE '2026-01-01' + CAST(o_custkey % 45 AS INT)
            AS date_utc FROM orders)
        SELECT b.date_utc FROM batch b
        ANTI JOIN existing e ON b.date_utc = e.date_utc
        ORDER BY date_utc""")),

    // ---- q46: the reference pipeline END-TO-END under the oracle
    // (EP1-EP3, K1-K5, J1-J3, D2; /root/reference/script.py:100-177 is
    // the whole reference program). Synthesizes TLE-text + NOAA-JSON
    // landing files deterministically from testdata, runs
    // TlePipeline.run TWICE into a fresh temp warehouse, and emits the
    // final fact_telemetry contents plus both runs' per-stage counts —
    // so the check-then-write idempotency fixpoint (second run adds
    // ZERO weather/dim/telemetry rows) is hash-gated, not just
    // spec-asserted. Epochs use a FIXED year and an index-valued day
    // fraction (injective in k ⇒ no intra-batch key collisions), with
    // the dedup horizon sized to cover them all; every 97th record gets
    // an alpha NORAD (parse-dropped, T5), and B* cycles the quirk
    // classes including signed-mantissa → null-field records. ----
    Q("q46_pipeline_idempotent",
      (s, dir) => {
        // Landing files are a per-JVM cached FIXTURE (deterministic
        // functions of the sf dir): the measured operator is the
        // pipeline run, not the fixture synthesis, and re-writing them
        // on every bench pass was the round-3 variance source. The
        // warehouse below stays fresh per invocation — the run-twice
        // fixpoint must start empty.
        val (tlePath, noaaPath) = q46Landing(s, dir)
        val tmp = graft.util.Scratch.dir("graft-q46-")
          .toString
        // run the pipeline twice, same inputs, batch-constant fetched_at
        // the landing fixture writes one whole record per text row, so
        // its multi-file shards are triple-aligned by construction
        val cfg = graft.pipeline.PipelineConfig(s"$tmp/wh",
          dedupHorizonDays = 400, tleAlignedFiles = true)
        val p = new graft.pipeline.TlePipeline(s, cfg)
        val fetchedAt = java.sql.Timestamp.from(
          java.time.Instant.parse("2027-01-10T00:00:00Z"))
        val r1 = p.run(tlePath, noaaPath, fetchedAt)
        val r2 = p.run(tlePath, noaaPath, fetchedAt)
        p.warehouse.read("fact_telemetry")
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("epoch_micros"),
            col("mean_motion"), col("b_star_drag"), col("rev_number"))
          .withColumn("r1_weather", lit(r1.weatherNew))
          .withColumn("r1_parsed", lit(r1.tleParsed))
          .withColumn("r1_sats", lit(r1.satsNew))
          .withColumn("r1_tele", lit(r1.telemetryNew))
          .withColumn("r2_weather", lit(r2.weatherNew))
          .withColumn("r2_parsed", lit(r2.tleParsed))
          .withColumn("r2_sats", lit(r2.satsNew))
          .withColumn("r2_tele", lit(r2.telemetryNew))
          .orderBy("norad_id", "epoch_micros")
      },
      Some(s"""
        WITH src AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
        synth AS (
          SELECT k,
            CASE WHEN k % 97 = 0 THEN 'XXXXX'
                 ELSE printf('%05d', (k * 7919) % 997) END AS norad_str,
            CASE k % 4
              WHEN 0 THEN printf(' %05d-%d', c % 100000, k % 5)
              WHEN 1 THEN printf('-%05d-%d', c % 100000, k % 5)
              WHEN 2 THEN ' 00000+0'
              ELSE printf(' %05d+%d', c % 100000, k % 2) END AS bstar_str,
            printf('%02d%03dA', k % 100, c % 1000) AS intl_raw,
            k % 365 + 1 AS day_int, k AS day_frac,
            k % 180 AS i_a, (k * 31) % 10000 AS i_b,
            (k * 7) % 360 AS r_a, (k * 37) % 10000 AS r_b,
            (k * 101) % 10000000 AS ecc7,
            (k * 11) % 360 AS p_a, (k * 41) % 10000 AS p_b,
            (k * 13) % 360 AS m_a, (k * 43) % 10000 AS m_b,
            k % 16 AS mm_a, (k * 2654435761) % 100000000 AS mm_b,
            k % 100000 AS rev
          FROM src),
        lines AS (
          SELECT k,
            printf('1 %5sU %-8s 26%03d.%08d  .00000000  00000-0 %8s 0  9991',
                   norad_str, intl_raw, day_int, day_frac, bstar_str) AS l1,
            printf('2 %5s %3d.%04d %3d.%04d %07d %3d.%04d %3d.%04d %2d.%08d%05d',
                   norad_str, i_a, i_b, r_a, r_b, ecc7, p_a, p_b, m_a, m_b,
                   mm_a, mm_b, rev) AS l2
          FROM synth),
        parsed AS (
          SELECT k,
            TRY_CAST(substr(l1, 3, 5) AS INT) AS norad_id,
            TRY_CAST(substr(l1, 21, 12) AS DOUBLE) AS epoch_day,
            trim(substr(l1, 54, 8)) AS braw,
            TRY_CAST(substr(l2, 53, 11) AS DOUBLE) AS mean_motion,
            TRY_CAST(substr(l2, 64, 5) AS INT) AS rev_number
          FROM lines),
        valid AS (
          SELECT k, norad_id,
                 epoch_us(make_date(2026, 1, 1)::TIMESTAMP)
                   + CAST(floor((epoch_day - 1) * 86400000000) AS BIGINT)
                   AS epoch_micros,
                 mean_motion, ${bstarSql("braw")} AS b_star_drag, rev_number
          FROM parsed WHERE norad_id IS NOT NULL),
        counts AS (
          SELECT CAST(count(*) AS BIGINT) AS n_valid,
                 CAST(count(DISTINCT norad_id) AS BIGINT) AS n_sats
          FROM valid),
        w AS (SELECT CAST(count(*) AS BIGINT) AS n_weather FROM nation)
        SELECT v.norad_id, v.epoch_micros, v.mean_motion, v.b_star_drag,
               v.rev_number,
               w.n_weather AS r1_weather, ct.n_valid AS r1_parsed,
               ct.n_sats AS r1_sats, ct.n_valid AS r1_tele,
               CAST(0 AS BIGINT) AS r2_weather, ct.n_valid AS r2_parsed,
               CAST(0 AS BIGINT) AS r2_sats, CAST(0 AS BIGINT) AS r2_tele
        FROM valid v, counts ct, w
        ORDER BY norad_id, epoch_micros""")),

    // ---- q50: STRUCTURED STREAMING under the oracle (§2.11) — the
    // watermarked bounded-state dedup (`dropDuplicatesWithinWatermark`
    // keyed on (norad_id, epoch_utc), Trigger.AvailableNow) run over a
    // synthesized telemetry backlog with planted duplicate rows.
    // Determinism by construction: duplicates are byte-identical rows
    // (whichever copy survives, the output row is the same), the key is
    // injective in o_orderkey so nothing else collides, and the backlog
    // is one parquet file → one micro-batch → the initial watermark
    // drops nothing. The oracle is then simply the distinct base set. ----
    Q("q50_streaming_dedup",
      (s, dir) => {
        val tmp = graft.util.Scratch.dir("graft-q50-")
          .toString
        def mk(o: DataFrame): DataFrame = o.select(
          (k % 500).cast("int").as("norad_id"),
          timestamp_micros(lit(1700000000000000L) +
            expr("o_orderkey DIV 500") * 3600000000L).as("epoch_utc"),
          timestamp_micros(lit(1800000000000000L)).as("fetched_at_utc"),
          ((k % 1800).cast("double") / 10.0).as("inclination"),
          ((k % 3600).cast("double") / 10.0).as("raan"),
          ((k % 10000).cast("double") / 10000000.0).as("eccentricity"),
          ((k % 3600).cast("double") / 10.0).as("arg_perigee"),
          ((k % 3600).cast("double") / 10.0).as("mean_anomaly"),
          (lit(15.0) + (k % 100).cast("double") / 100.0).as("mean_motion"),
          when(k % 7 === 0, lit(null).cast("double"))
            .otherwise((k % 1000).cast("double") / 100000.0).as("b_star_drag"),
          (k % 100000).cast("int").as("rev_number"))
        val o = t(s, dir, "orders")
        mk(o).unionByName(mk(o.where(k % 5 === 0))) // identical dup rows
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/src")
        val q = graft.streaming.StreamingIngest.telemetryStream(
          s, s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
        q.awaitTermination()
        s.read.schema(graft.schema.Schemas.factTelemetry)
          .parquet(s"$tmp/out")
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("epoch_micros"),
            col("inclination"), col("mean_motion"), col("b_star_drag"),
            col("rev_number"))
          .orderBy("norad_id", "epoch_micros")
      },
      Some("""
        SELECT CAST(o_orderkey % 500 AS INT) AS norad_id,
               1700000000000000 + (o_orderkey // 500) * 3600000000
                 AS epoch_micros,
               CAST(o_orderkey % 1800 AS DOUBLE) / 10.0 AS inclination,
               15.0 + CAST(o_orderkey % 100 AS DOUBLE) / 100.0 AS mean_motion,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(o_orderkey % 1000 AS DOUBLE) / 100000.0
               END AS b_star_drag,
               CAST(o_orderkey % 100000 AS INT) AS rev_number
        FROM orders
        ORDER BY norad_id, epoch_micros""")),

    // ---- q51: the SQL surface of the domain pack (SURVEY §4 item 3) —
    // the same expressions q22/q33 exercise through the Column DSL, but
    // entered through `spark.sql` text, so the SparkSessionExtensions /
    // FunctionRegistry registration (`GraftExtensions`) is itself under
    // the driver gate: if `tle_bstar` or the native `vec_dot` ever went
    // unregistered, this entry fails to ANALYZE. ----
    Q("q51_sql_function_surface",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_q51_orders")
        s.sql("""
          SELECT o_orderkey,
                 tle_bstar(CASE CAST(o_orderkey % 6 AS INT)
                   WHEN 0 THEN format_string(' %05d-%d', o_custkey % 100000, o_orderkey % 5)
                   WHEN 1 THEN format_string('-%05d-%d', o_custkey % 100000, o_orderkey % 5)
                   WHEN 2 THEN format_string('+%05d-%d', o_custkey % 100000, o_orderkey % 5)
                   WHEN 3 THEN format_string('0.%06d', o_custkey % 1000000)
                   WHEN 4 THEN 'XXXXXXXX'
                   ELSE ' 00000+0' END) AS b_star,
                 vec_dot(array(CAST(o_orderkey AS DOUBLE), 2.0D),
                         array(3.0D, 4.0D)) AS vd
          FROM graft_q51_orders
          ORDER BY o_orderkey""")
      },
      Some(s"""
        WITH src AS (
          SELECT o_orderkey, o_orderkey % 6 AS cls,
                 o_custkey % 100000 AS m, o_orderkey % 5 AS e,
                 o_custkey % 1000000 AS m6
          FROM orders),
        raw AS (
          SELECT o_orderkey,
            trim(CASE cls
              WHEN 0 THEN printf(' %05d-%d', m, e)
              WHEN 1 THEN printf('-%05d-%d', m, e)
              WHEN 2 THEN printf('+%05d-%d', m, e)
              WHEN 3 THEN printf('0.%06d', m6)
              WHEN 4 THEN 'XXXXXXXX'
              ELSE ' 00000+0' END) AS s
          FROM src)
        SELECT o_orderkey, ${bstarSql("s")} AS b_star,
               CAST(3 * o_orderkey + 8 AS DOUBLE) AS vd
        FROM raw ORDER BY o_orderkey""")),

    // ---- q52: the JDBC surface under the oracle (S4-S6 scan with
    // pushdown + K2-K4 batched append; the reference's warehouse is
    // PostgreSQL — embedded Derby is the sandbox stand-in, same Spark
    // connector). Round-trips customer through a fresh in-memory Derby
    // db (batchsize=1000, the reference's chunksize), reads it back
    // with a pushable range predicate plus a post-scan residual, and
    // the oracle replays the equivalent relational algebra on the
    // parquet source — so type mapping, batching, and the scan path are
    // all inside the hash compare. ----
    Q("q52_jdbc_roundtrip",
      (s, dir) => {
        // unique per-invocation db name (temp path uniqueness), so bench
        // re-runs never append into a previous invocation's table
        val db = graft.util.Scratch.dir("graft-q52-")
          .getFileName.toString
        val url = s"jdbc:derby:memory:$db;create=true"
        val src = t(s, dir, "customer").select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
        graft.sink.JdbcSink.append(src, url, "t_customer")
        graft.sink.JdbcSink.read(s, url, "t_customer")
          .where(col("c_acctbal") > 1000.0 && col("c_custkey") % 7 === 2)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > 1000.0 AND c_custkey % 7 = 2
        ORDER BY c_custkey""")),

    // ---- q56: warehouse MERGE upsert under the oracle — the
    // star-schema maintenance op the reference's append-only sinks
    // lack (late-arriving corrected TLEs). Copy-on-write with dynamic
    // partition overwrite: only the partitions the update batch touches
    // are read/rewritten (WarehouseMergeSpec asserts untouched partition
    // files stay byte-identical). Base batch from orders (composite key
    // (norad_id, epoch_utc), epoch offset (k%40)*86400+k s is injective
    // because 86400 ≡ 0 mod 40); updates REPLACE every 3rd row
    // (mean_motion += 100, rev += 1) and INSERT shifted-norad copies of
    // every 11th. The oracle computes the same fixpoint relationally:
    // base minus updated keys, union updates. ----
    Q("q56_warehouse_merge_upsert",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q56-")
          .toString
        val (base, updates) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh")
        wh.bootstrap()
        wh.append("fact_telemetry", base.drop("k"))
        wh.merge("fact_telemetry", updates, Seq("norad_id", "epoch_utc"))
        wh.read("fact_telemetry")
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("epoch_micros"),
            col("mean_motion"), col("b_star_drag"),
            col("rev_number").cast("int").as("rev_number"))
          .orderBy("norad_id", "epoch_micros")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion,
                 CASE WHEN k % 5 = 0 THEN NULL
                      ELSE CAST(k % 7 AS DOUBLE) END AS b_star_drag,
                 CAST(k % 100000 AS INT) AS rev_number, k
          FROM src),
        upd AS (
          SELECT norad_id, epoch_micros, mean_motion + 100.0 AS mean_motion,
                 b_star_drag, CAST(rev_number + 1 AS INT) AS rev_number
          FROM base WHERE k % 3 = 0
          UNION ALL
          SELECT CAST(norad_id + 2000 AS INT), epoch_micros, mean_motion,
                 b_star_drag, rev_number
          FROM base WHERE k % 11 = 0)
        SELECT norad_id, epoch_micros, mean_motion, b_star_drag, rev_number
        FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM upd u
                          WHERE u.norad_id = b.norad_id
                            AND u.epoch_micros = b.epoch_micros)
        UNION ALL
        SELECT norad_id, epoch_micros, mean_motion, b_star_drag, rev_number
        FROM upd
        ORDER BY norad_id, epoch_micros""")),

    // ---- q74: TIME TRAVEL through the versioned manifest — the
    // capability the crash-safe commit protocol buys beyond safety:
    // under retainReplaced retention, the pre-merge version stays
    // readable AFTER the merge rewrote its partitions. Emits the
    // pre-merge snapshot and the post-merge head tagged side by side
    // (same upsert fixture as q56); the oracle replays both states
    // relationally — 'before' is the raw base, 'after' is q56's merged
    // result. ----
    Q("q74_warehouse_time_travel",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q74-")
          .toString
        val (base, updates) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true)
        wh.bootstrap()
        wh.append("fact_telemetry", base.drop("k"))
        val preMerge = wh.versions("fact_telemetry").last
        wh.merge("fact_telemetry", updates, Seq("norad_id", "epoch_utc"))
        def shot(df: DataFrame, tag: String) = df.select(
          lit(tag).as("snapshot"), col("norad_id"),
          unix_micros(col("epoch_utc")).as("epoch_micros"),
          col("mean_motion"), col("b_star_drag"),
          col("rev_number").cast("int").as("rev_number"))
        shot(wh.readVersion("fact_telemetry", preMerge), "before")
          .unionByName(shot(wh.read("fact_telemetry"), "after"))
          .orderBy("snapshot", "norad_id", "epoch_micros")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion,
                 CASE WHEN k % 5 = 0 THEN NULL
                      ELSE CAST(k % 7 AS DOUBLE) END AS b_star_drag,
                 CAST(k % 100000 AS INT) AS rev_number, k
          FROM src),
        upd AS (
          SELECT norad_id, epoch_micros, mean_motion + 100.0 AS mean_motion,
                 b_star_drag, CAST(rev_number + 1 AS INT) AS rev_number
          FROM base WHERE k % 3 = 0
          UNION ALL
          SELECT CAST(norad_id + 2000 AS INT), epoch_micros, mean_motion,
                 b_star_drag, rev_number
          FROM base WHERE k % 11 = 0),
        merged AS (
          SELECT norad_id, epoch_micros, mean_motion, b_star_drag, rev_number
          FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u
                            WHERE u.norad_id = b.norad_id
                              AND u.epoch_micros = b.epoch_micros)
          UNION ALL
          SELECT norad_id, epoch_micros, mean_motion, b_star_drag, rev_number
          FROM upd)
        SELECT 'before' AS snapshot, norad_id, epoch_micros, mean_motion,
               b_star_drag, rev_number
        FROM base
        UNION ALL
        SELECT 'after', norad_id, epoch_micros, mean_motion,
               b_star_drag, rev_number
        FROM merged
        ORDER BY snapshot, norad_id, epoch_micros""")),

    // ---- q76: INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the
    // warehouse change feed. A per-satellite aggregate (row count + sum
    // of mean_motion) is materialized from the appended base, then a
    // MERGE upsert lands, and the view is brought current by folding
    // ONLY `readChangeFeed` (rows ± their `_change_delta`) into the
    // stale state — never rescanning the table. The oracle recomputes
    // the aggregate from scratch over the merged state: incremental ==
    // full is exactly the MV-maintenance correctness statement. Scale:
    // the feed reads the touched partitions' files twice (old + new
    // version); maintenance cost is O(merge footprint), not O(history).
    Q("q76_warehouse_incremental_mv",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q76-")
          .toString
        val (base, updates) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true)
        wh.bootstrap()
        wh.append("fact_telemetry", base.drop("k"))
        val checkpoint = wh.versions("fact_telemetry").last
        // stale MV: the file list is resolved eagerly at read() time, so
        // this plan keeps reading the pre-merge snapshot lazily
        val mv0 = wh.read("fact_telemetry").groupBy("norad_id")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("mean_motion")).as("sum_mm"))
        wh.merge("fact_telemetry", updates, Seq("norad_id", "epoch_utc"))
        val delta = wh.readChangeFeed("fact_telemetry", checkpoint)
          .groupBy("norad_id")
          .agg(sum(col("_change_delta")).cast("long").as("n_rows"),
            sum(col("mean_motion") * col("_change_delta")).as("sum_mm"))
        mv0.unionByName(delta).groupBy("norad_id")
          .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_mm")).as("sum_mm"))
          .where(col("n_rows") > 0)
          .select(col("norad_id"), col("n_rows").cast("long").as("n_rows"),
            round(col("sum_mm"), 2).as("sum_mean_motion"))
          .orderBy("norad_id")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion, k
          FROM src),
        upd AS (
          SELECT norad_id, epoch_micros, mean_motion + 100.0 AS mean_motion
          FROM base WHERE k % 3 = 0
          UNION ALL
          SELECT CAST(norad_id + 2000 AS INT), epoch_micros, mean_motion
          FROM base WHERE k % 11 = 0),
        merged AS (
          SELECT norad_id, epoch_micros, mean_motion
          FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u
                            WHERE u.norad_id = b.norad_id
                              AND u.epoch_micros = b.epoch_micros)
          UNION ALL
          SELECT norad_id, epoch_micros, mean_motion FROM upd)
        SELECT norad_id, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(mean_motion), 2) AS sum_mean_motion
        FROM merged
        GROUP BY norad_id
        ORDER BY norad_id""")),

    // ---- q79: Z-ORDER CLUSTERED COMPACTION end-to-end: a fragmented
    // append (many small files per date partition) is rewritten by
    // compact(clusterBy = morton(norad_id, minute-of-day)), then a
    // selective 2-D scan runs over the re-laid table. The oracle
    // recomputes relationally — proving the re-layout is purely
    // physical (no row lost/dup'd, predicate semantics intact), while
    // ZOrderSpec asserts the physical half (files actually skipped on
    // both dimensions). ----
    Q("q79_warehouse_zorder_scan",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q79-")
          .toString
        val (base, _) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh")
        wh.bootstrap()
        // fragment to ~4 files per date partition at ANY scale factor —
        // a fixed rows-per-file would write O(rows) files at sf1+ (the
        // q46 small-files trap, measured and documented in SURVEY §8)
        val perFile = math.max(100L, base.count() / 160L)
        wh.append("fact_telemetry", base.drop("k"), rowsPerFile = perFile)
        val minuteOfDay =
          (unix_micros(col("epoch_utc")) % 86400000000L) / 60000000L
        wh.compact("fact_telemetry", rowsPerFile = perFile,
          clusterBy = Seq(graft.functions.ZOrder.interleave(
            col("norad_id"), minuteOfDay)))
        wh.read("fact_telemetry")
          .where(col("norad_id") >= 100 && col("norad_id") < 300)
          .groupBy("norad_id")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            round(sum(col("mean_motion")), 2).as("sum_mean_motion"))
          .orderBy("norad_id")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion
          FROM src)
        SELECT norad_id, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(mean_motion), 2) AS sum_mean_motion
        FROM base
        WHERE norad_id >= 100 AND norad_id < 300
        GROUP BY norad_id
        ORDER BY norad_id""")),

    // ---- q81: the graft-warehouse STREAMING source under the gate —
    // manifest-version offsets, snapshot-then-follow. Three appends
    // land as three commits with a checkpointed AvailableNow drain
    // after each; the parquet sink must then hold the table EXACTLY
    // once (any duplicate or dropped delta fails the count/hash
    // compare), and the oracle recomputes the final table
    // relationally. ----
    Q("q81_warehouse_stream_follow",
      (s, dir) => {
        val root = graft.util.Scratch.dir("graft-q81-")
          .toString
        val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
        val (base, _) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, whDir)
        wh.bootstrap()
        def drain(): Unit = {
          val q = s.readStream.format("graft-warehouse")
            .option("path", whDir).option("table", "fact_telemetry").load()
            .select(col("norad_id"),
              unix_micros(col("epoch_utc")).as("epoch_micros"),
              col("mean_motion"))
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckp)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        (0 to 2).foreach { i =>
          wh.append("fact_telemetry", base.where(k % 3 === i).drop("k"))
          drain()
        }
        s.read.schema("norad_id int, epoch_micros long, mean_motion double")
          .parquet(sink)
          .orderBy("norad_id", "epoch_micros")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders)
        SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
               epoch_us(TIMESTAMP '2026-01-01')
                 + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
               CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion
        FROM src
        ORDER BY norad_id, epoch_micros""")),

    // ---- q83: row-level DML through the versioned manifest — the
    // DELETE/UPDATE pair that completes the warehouse's Delta-op
    // surface (merge=q56, compact=q79, time travel=q74, CDF=q76/q81).
    // DELETE purges a norad band (the GDPR/opt-out shape: both ops
    // rewrite ONLY files containing matches — WarehouseDmlSpec pins the
    // untouched-file identity and both crash windows), then UPDATE
    // patches the null-B* rows against their OLD values. The oracle
    // replays both statements relationally with SQL three-valued
    // predicate semantics. ----
    Q("q83_warehouse_delete_update",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q83-")
          .toString
        val (base, _) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh")
        wh.bootstrap()
        wh.append("fact_telemetry", base.drop("k"))
        wh.delete("fact_telemetry",
          col("norad_id") % 10 === 3 && col("mean_motion") < 8.0)
        wh.update("fact_telemetry", col("b_star_drag").isNull,
          Map("rev_number" -> (col("rev_number") + 100000),
            "mean_motion" -> (col("mean_motion") + 1000.0)))
        wh.read("fact_telemetry")
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("epoch_micros"),
            col("mean_motion"), col("b_star_drag"),
            col("rev_number").cast("int").as("rev_number"))
          .orderBy("norad_id", "epoch_micros")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion,
                 CASE WHEN k % 5 = 0 THEN NULL
                      ELSE CAST(k % 7 AS DOUBLE) END AS b_star_drag,
                 CAST(k % 100000 AS INT) AS rev_number
          FROM src),
        kept AS (
          SELECT * FROM base
          WHERE NOT (norad_id % 10 = 3 AND mean_motion < 8.0))
        SELECT norad_id, epoch_micros,
               CASE WHEN b_star_drag IS NULL THEN mean_motion + 1000.0
                    ELSE mean_motion END AS mean_motion,
               b_star_drag,
               CASE WHEN b_star_drag IS NULL
                    THEN CAST(rev_number + 100000 AS INT)
                    ELSE rev_number END AS rev_number
        FROM kept
        ORDER BY norad_id, epoch_micros""")),

    // ---- q96: CONDITIONAL MERGE (the full Delta MERGE INTO clause
    // set) — one source batch carrying deletions (negative mean_motion
    // markers), corrections, and candidate inserts: WHEN MATCHED AND
    // src<0 DELETE / WHEN MATCHED UPDATE from source / WHEN NOT MATCHED
    // AND even-rev INSERT, all in one touched-partition copy-on-write
    // commit. The oracle replays the clause semantics (delete
    // precedence, conditional insert) relationally. ----
    Q("q96_warehouse_merge_into",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q96-")
          .toString
        val (base, _) = mergeFixture(s, dir)
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh")
        wh.bootstrap()
        wh.append("fact_telemetry", base.drop("k"))
        val source = base.where(k % 3 === 0)
            // col("k"): base CARRIES the key copy — the bare `k`
            // (o_orderkey) only resolves in Filter/Sort via the
            // missing-reference rule, not inside a projection
            .withColumn("mean_motion",
              when(col("k") % 9 === 0, lit(-1.0))
                .otherwise(col("mean_motion") + 100.0))
            .withColumn("rev_number", (col("rev_number") + 1).cast("int"))
          .unionByName(base.where(k % 11 === 0)
            .withColumn("norad_id", (col("norad_id") + 2000).cast("int")))
          .drop("k")
        wh.mergeInto("fact_telemetry", source, Seq("norad_id", "epoch_utc"),
          matchedDelete = Some(col("src_mean_motion") < 0),
          matchedUpdate = Some((None,
            Map("mean_motion" -> col("src_mean_motion"),
              "rev_number" -> col("src_rev_number")))),
          notMatchedInsert = Some(Some(col("rev_number") % 2 === 0)))
        wh.read("fact_telemetry")
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("epoch_micros"),
            col("mean_motion"),
            col("rev_number").cast("int").as("rev_number"))
          .orderBy("norad_id", "epoch_micros")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS epoch_micros,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion,
                 CAST(k % 100000 AS INT) AS rev_number, k
          FROM src),
        survivors AS (
          SELECT norad_id, epoch_micros,
                 CASE WHEN k % 3 = 0 THEN mean_motion + 100.0
                      ELSE mean_motion END AS mean_motion,
                 CASE WHEN k % 3 = 0 THEN CAST(rev_number + 1 AS INT)
                      ELSE rev_number END AS rev_number
          FROM base
          WHERE NOT (k % 3 = 0 AND k % 9 = 0)),
        inserts AS (
          SELECT CAST(norad_id + 2000 AS INT) AS norad_id, epoch_micros,
                 mean_motion, rev_number
          FROM base
          WHERE k % 11 = 0 AND rev_number % 2 = 0)
        SELECT norad_id, epoch_micros, mean_motion, rev_number
        FROM survivors
        UNION ALL
        SELECT norad_id, epoch_micros, mean_motion, rev_number FROM inserts
        ORDER BY norad_id, epoch_micros""")),

    // ---- q100: the warehouse LIFECYCLE grand tour — bootstrap →
    // append → addColumn schema evolution → post-evolution append →
    // UPDATE backfilling the new column on pre-evolution rows → DELETE
    // → compact → vacuum, final state under the hash gate. This puts
    // schema evolution itself under the ORACLE (pre-evolution rows
    // surface the new column as NULL until the backfill), and proves
    // compact+vacuum are content-invariant end-to-end. ----
    Q("q100_warehouse_lifecycle",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q100-")
          .toString
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("id"))))
        wh.bootstrap()
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        wh.append("t", src.where(col("id") % 2 === 0))
        wh.addColumn("t", StructField("tag", StringType))
        wh.append("t", src.where(col("id") % 2 === 1)
          .withColumn("tag", lit("b2")))
        wh.update("t", col("tag").isNull, Map("tag" -> lit("b1")))
        wh.delete("t", col("id") % 7 === 0)
        wh.compact("t")
        wh.vacuum("t")
        wh.read("t").orderBy("id")
      },
      Some("""
        SELECT o_orderkey AS id,
               'g' || (o_orderkey % 10) AS grp,
               o_totalprice AS "val",
               CASE WHEN o_orderkey % 2 = 0 THEN 'b1' ELSE 'b2' END AS tag
        FROM orders
        WHERE o_orderkey % 7 <> 0
        ORDER BY id""")),

    // ---- q101: the SQL STATEMENT surface end-to-end — the same
    // warehouse engine as q100, but every mutation and read is a
    // `spark.sql` string routed through the injected parser
    // (graft.sql.WarehouseSql): INSERT INTO ×2, UPDATE, DELETE, a
    // 3-clause MERGE INTO, and a final SELECT joining the current state
    // against `VERSION AS OF 2` time travel. The reference user speaks
    // SQL (script.py:77-83,159); this is that surface under the hash
    // gate, with the oracle replaying every statement relationally. ----
    Q("q101_warehouse_sql_dml",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q101-").toString
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        // retention mode: the VERSION AS OF 2 read at the end must
        // still find the first append's files after the DML rewrites
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("id"))))
        wh.bootstrap()                                              // v1
        wh.registerSql("dml_")
        t(s, dir, "orders").select(col("o_orderkey").as("id"),
            concat(lit("g"), col("o_orderkey") % 10).as("grp"),
            col("o_totalprice").as("val"))
          .createOrReplaceTempView("dml_src")
        s.sql("INSERT INTO dml_t SELECT id, grp, val FROM dml_src " +
          "WHERE id % 2 = 0")                                       // v2
        s.sql("INSERT INTO dml_t (id, grp, val) " +
          "SELECT id, grp, val FROM dml_src WHERE id % 2 = 1")      // v3
        s.sql("UPDATE dml_t SET val = val + 1000 WHERE grp = 'g3'") // v4
        s.sql("DELETE FROM dml_t WHERE id % 7 = 0")                 // v5
        s.sql("""
          MERGE INTO dml_t tgt USING (
            SELECT id, concat('m', grp) AS grp, val FROM dml_src
            WHERE id % 5 = 0
          ) src ON tgt.id = src.id
          WHEN MATCHED AND tgt.val < 1000 THEN DELETE
          WHEN MATCHED THEN UPDATE SET grp = src.grp
          WHEN NOT MATCHED AND src.id % 2 = 0 THEN INSERT *
        """)                                                        // v6
        s.sql("""
          SELECT c.id, c.grp, round(c.val, 2) AS val,
                 round(v.val, 2) AS val_v2
          FROM dml_t c
          LEFT JOIN (SELECT id, val FROM dml_t VERSION AS OF 2) v
            ON c.id = v.id
          ORDER BY c.id
        """)
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 10) AS grp,
                 o_totalprice AS "val"
          FROM orders),
        after_upd AS (
          SELECT id, grp,
                 CASE WHEN grp = 'g3' THEN "val" + 1000 ELSE "val" END AS "val"
          FROM src),
        after_del AS (SELECT * FROM after_upd WHERE id % 7 <> 0),
        msrc AS (
          SELECT id, 'm' || grp AS grp, "val" FROM src WHERE id % 5 = 0),
        merged AS (
          SELECT d.id,
                 CASE WHEN m.id IS NOT NULL THEN m.grp ELSE d.grp END AS grp,
                 d."val"
          FROM after_del d LEFT JOIN msrc m ON d.id = m.id
          WHERE NOT (m.id IS NOT NULL AND d."val" < 1000)),
        inserts AS (
          SELECT m.id, m.grp, m."val"
          FROM msrc m LEFT JOIN after_del d ON m.id = d.id
          WHERE d.id IS NULL AND m.id % 2 = 0),
        current_t AS (
          SELECT * FROM merged UNION ALL SELECT * FROM inserts),
        v2 AS (SELECT id, "val" FROM src WHERE id % 2 = 0)
        SELECT c.id, c.grp, round(c."val", 2) AS "val",
               round(v."val", 2) AS val_v2
        FROM current_t c LEFT JOIN v2 v ON c.id = v.id
        ORDER BY c.id""")),

    // ---- q102: the native STREAMING SINK under the gate —
    // writeStream.format("graft-warehouse") drains a file-source in
    // AvailableNow mode, a second wave lands and re-drains over the
    // SAME checkpoint, then an idle third drain runs. Exactly-once is
    // what the hash proves: any replayed epoch would double rows and
    // break the oracle, which is just the source relation itself. ----
    Q("q102_warehouse_stream_sink",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types._
        val root = graft.util.Scratch.dir("graft-q102-").toString
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        src.where(col("id") % 2 === 0).write.parquet(s"$root/src")
        val wh = new graft.pipeline.Warehouse(s, s"$root/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("id"))))
        wh.bootstrap()
        def drain(): Unit = {
          val q = s.readStream.schema(schema).parquet(s"$root/src")
            .writeStream.format("graft-warehouse")
            .option("path", s"$root/wh").option("table", "t")
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        drain()                                             // wave 1
        src.where(col("id") % 2 === 1).write.mode("append")
          .parquet(s"$root/src")
        drain()                                             // wave 2
        drain()                                             // idle restart
        wh.read("t")
          .select(col("id"), col("grp"), round(col("val"), 2).as("val"))
          .orderBy("id")
      },
      Some("""
        SELECT o_orderkey AS id, 'g' || (o_orderkey % 10) AS grp,
               round(o_totalprice, 2) AS "val"
        FROM orders
        ORDER BY id""")),

    // ---- q113: the upsert half of the streaming sink (q102 is the
    // append half): an UPDATE-mode streaming aggregation flows straight
    // into a warehouse table via `.option("mergeKeys", ...)` — each
    // epoch's changed groups merge by key, so the table IS a
    // continuously-maintained materialized view, exactly-once across
    // the restart (the txn fence makes stale cumulative snapshots
    // no-ops — a replay would otherwise REGRESS the view). The oracle
    // recomputes the aggregate directly over all waves. ----
    Q("q113_warehouse_stream_upsert",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types._
        val root = graft.util.Scratch.dir("graft-q113-").toString
        val srcSchema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val mvSchema = StructType(Seq(
          StructField("grp", StringType),
          StructField("n", LongType),
          StructField("total", DoubleType)))
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        src.where(col("id") % 2 === 0).write.parquet(s"$root/src")
        val wh = new graft.pipeline.Warehouse(s, s"$root/wh",
          specs = Map("mv" -> graft.pipeline.Warehouse.TableSpec(mvSchema)))
        wh.bootstrap()
        def drain(): Unit = {
          val q = s.readStream.schema(srcSchema).parquet(s"$root/src")
            .groupBy(col("grp"))
            .agg(count(lit(1)).cast("long").as("n"),
              sum(col("val")).as("total"))
            .writeStream.format("graft-warehouse")
            .option("path", s"$root/wh").option("table", "mv")
            .option("mergeKeys", "grp")
            .option("checkpointLocation", s"$root/ckpt")
            .outputMode("update")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        drain()                                             // wave 1
        src.where(col("id") % 2 === 1).write.mode("append")
          .parquet(s"$root/src")
        drain()                                             // wave 2
        drain()                                             // idle restart
        wh.read("mv")
          .select(col("grp"), col("n"), round(col("total"), 2).as("total"))
          .orderBy("grp")
      },
      Some("""
        SELECT 'g' || (o_orderkey % 10) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1 ORDER BY grp""")),

    // ---- q120: the full CDC REPLICATION composition under one hash
    // gate — upstream warehouse takes an append + UPDATE + DELETE mix,
    // its change feed streams through the CDF source into a downstream
    // EVENT LOG via the exactly-once sink (two drains + an idle
    // restart over one checkpoint), and the log DELTA-FOLDS to exactly
    // the upstream state the oracle recomputes directly. A lost feed
    // row, replayed epoch, or broken retraction breaks the hash. ----
    Q("q120_warehouse_cdc_replication",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types._
        val root = graft.util.Scratch.dir("graft-q120-").toString
        val upSchema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val logSchema = upSchema.add(
          StructField("_change_delta", IntegerType, nullable = false))
        val up = new graft.pipeline.Warehouse(s, s"$root/up",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(upSchema)))
        up.bootstrap()
        val down = new graft.pipeline.Warehouse(s, s"$root/down",
          specs = Map("log" -> graft.pipeline.Warehouse.TableSpec(logSchema)))
        down.bootstrap()
        def drain(): Unit = {
          val q = s.readStream.format("graft-warehouse")
            .option("path", s"$root/up").option("table", "t")
            .option("readChangeFeed", "true").load()
            .writeStream.format("graft-warehouse")
            .option("path", s"$root/down").option("table", "log")
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        up.append("t", src.where(col("id") % 3 === 0))
        drain()                                             // wave 1
        up.append("t", src.where(col("id") % 3 === 1))
        up.update("t", col("grp") === "g4",
          Map("val" -> (col("val") + 500.0)))
        up.delete("t", col("id") % 11 === 0)
        drain()                                             // wave 2
        drain()                                             // idle restart
        down.read("log").groupBy(col("grp"))
          .agg(sum(col("_change_delta")).cast("long").as("n_rows"),
            round(sum(col("val") * col("_change_delta")), 2).as("total"))
          .where(col("n_rows") > 0)
          .orderBy("grp")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 10) AS grp,
                 o_totalprice AS "val"
          FROM orders WHERE o_orderkey % 3 IN (0, 1)),
        upd AS (
          SELECT id, grp,
                 CASE WHEN grp = 'g4' THEN "val" + 500 ELSE "val" END AS "val"
          FROM src),
        del AS (SELECT * FROM upd WHERE id % 11 <> 0)
        SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum("val"), 2) AS total
        FROM del GROUP BY grp ORDER BY grp""")),

    // ---- q124: SHALLOW CLONE fork-and-diverge under the hash gate —
    // the zero-copy what-if workflow: clone the table at a PAST version
    // (evens-only state), rewrite the clone twice (DELETE + UPDATE,
    // both copy-on-write over borrowed file references), and read both
    // sides. The source must be bit-identical to never-forked history
    // and the fork must show exactly the cloned version plus its own
    // DML — the oracle replays both lineages relationally. A leaked
    // borrowed-file deletion, a clone write visible in the source, or
    // a fork reading the wrong version all break the hash. ----
    Q("q124_warehouse_clone_fork",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q124-").toString
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("id"))))
        wh.bootstrap() // v1
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        wh.append("t", src.where(col("id") % 2 === 0)) // v2: evens
        wh.append("t", src.where(col("id") % 2 === 1)) // v3: odds
        wh.shallowClone("t", "fork", Some(2L)) // fork the evens state
        wh.delete("fork", col("id") % 10 === 0)
        wh.update("fork", col("id") % 4 === 2,
          Map("val" -> (col("val") + 1)))
        wh.read("t").withColumn("side", lit("src"))
          .unionByName(wh.read("fork").withColumn("side", lit("fork")))
          .select(col("side"), col("id"), col("grp"), col("val"))
          .orderBy("side", "id")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS id,
                 'g' || (o_orderkey % 10) AS grp,
                 o_totalprice AS "val"
          FROM orders),
        fork AS (
          SELECT id, grp,
                 CASE WHEN id % 4 = 2 THEN "val" + 1 ELSE "val" END AS "val"
          FROM src
          WHERE id % 2 = 0 AND id % 10 <> 0)
        SELECT 'src' AS side, id, grp, "val" FROM src
        UNION ALL
        SELECT 'fork' AS side, id, grp, "val" FROM fork
        ORDER BY side, id""")),

    // ---- q93: time-series RESAMPLING with last-observation-carried-
    // forward — irregular telemetry onto a regular daily grid per
    // satellite, THROUGH the native as-of join (the resample grid is
    // the left side, observations the right: LOCF IS an as-of join).
    // Day indices are integral micros division so grid edges are
    // engine-exact; the oracle uses DuckDB's own ASOF LEFT JOIN, a
    // genuinely independent second implementation of the semantics.
    // Grid rows before a satellite's first observation surface NULL
    // (left-join contract on both sides). ----
    Q("q93_telemetry_resample_locf",
      (s, dir) => {
        val (base, _) = mergeFixture(s, dir)
        val obs = base.where(col("norad_id") < 50)
          .select(col("norad_id"),
            unix_micros(col("epoch_utc")).as("ts"), col("mean_motion"))
        val span = obs.groupBy("norad_id")
          .agg(expr("min(ts) DIV 86400000000").as("d0"),
            expr("max(ts) DIV 86400000000").as("d1"))
        val grid = span
          .select(col("norad_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
          .select(col("norad_id"), col("day"),
            (col("day") * 86400000000L).as("ts"))
        graft.operators.AsOfJoin.asof(grid, obs, Seq("norad_id"), "ts",
            Seq("mean_motion"))
          .select(col("norad_id"), col("day"),
            col("asof_mean_motion").as("mean_motion_locf"))
          .orderBy("norad_id", "day")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        base AS (
          SELECT CAST((k * 7919) % 997 AS INT) AS norad_id,
                 epoch_us(TIMESTAMP '2026-01-01')
                   + ((k % 40) * 86400 + k) * 1000000 AS ts,
                 CAST(k % 1600 AS DOUBLE) / 100.0 AS mean_motion
          FROM src
          WHERE (k * 7919) % 997 < 50),
        span AS (
          SELECT norad_id, min(ts) // 86400000000 AS d0,
                 max(ts) // 86400000000 AS d1
          FROM base GROUP BY norad_id),
        grid AS (
          SELECT norad_id, unnest(range(d0, d1 + 1)) AS day
          FROM span),
        g2 AS (SELECT norad_id, day, day * 86400000000 AS ts FROM grid)
        SELECT g.norad_id, g.day, o.mean_motion AS mean_motion_locf
        FROM g2 g ASOF LEFT JOIN base o
          ON g.norad_id = o.norad_id AND o.ts <= g.ts
        ORDER BY g.norad_id, g.day""")),

    // ---- q65: the DataSource V2 TLE source under the gate — S1/S2 as
    // a first-class `spark.read.format("graft-tle")` source (one
    // InputPartition per landing file, per-file triple assembly,
    // column pruning). Reads the q46 landing fixture and re-derives
    // every record field positionally; the oracle reconstructs the
    // same records relationally from orders. The %08d day-fraction
    // field is the order key (injective in o_orderkey). ----
    Q("q65_dsv2_tle_source",
      (s, dir) => {
        val (tlePath, _) = q46Landing(s, dir)
        s.read.format("graft-tle").load(tlePath)
          .select(col("sat_name"),
            substring(col("l1"), 25, 8).cast("int").as("rec_id"),
            substring(col("l1"), 3, 5).cast("int").as("norad_id"),
            substring(col("l2"), 64, 5).cast("int").as("rev_number"))
          .orderBy("rec_id")
      },
      Some("""
        WITH src AS (SELECT o_orderkey AS k FROM orders),
        synth AS (
          SELECT k, CASE WHEN k % 97 = 0 THEN 'XXXXX'
                         ELSE printf('%05d', (k * 7919) % 997)
                    END AS norad_str
          FROM src)
        SELECT 'SAT-' || norad_str AS sat_name,
               CAST(k AS INT) AS rec_id,
               TRY_CAST(norad_str AS INT) AS norad_id,
               CAST(k % 100000 AS INT) AS rev_number
        FROM synth ORDER BY rec_id""")),

    // ---- q63: declarative DATA-QUALITY AUDIT (the reference's K5
    // "refuse empty batch" gate generalized): completeness, key
    // uniqueness, value ranges, referential integrity — row-local
    // checks fused into ONE conditional-count scan, uniqueness as one
    // keyed shuffle, FK orphans as a broadcast anti-join. The fixture
    // plants every violation class deterministically (nulled custkeys,
    // orphaned FKs, negated prices, duplicated keys) and the oracle
    // recomputes each count relationally. ----
    Q("q63_quality_audit",
      (s, dir) => {
        import graft.pipeline.QualityAudit
        import graft.pipeline.QualityAudit._
        val k = col("o_orderkey")
        val base = t(s, dir, "orders")
        val mutated = base.select(
          k.as("o_orderkey"),
          when(k % 97 === 0, lit(null))
            .when(k % 83 === 0, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("o_custkey"),
          when(k % 89 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
          .unionByName(base.where(k % 101 === 0)
            .select("o_orderkey", "o_custkey", "o_totalprice"))
        QualityAudit.audit(mutated, Seq(
            NotNull("o_custkey"),
            Unique(Seq("o_orderkey")),
            InRange("o_totalprice", 0.0, 1000000.0),
            RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")))
          .orderBy("check")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k, o_custkey, o_totalprice FROM orders),
        mut AS (
          SELECT k,
                 CASE WHEN k % 97 = 0 THEN NULL
                      WHEN k % 83 = 0 THEN o_custkey + 10000000
                      ELSE o_custkey END AS ck,
                 CASE WHEN k % 89 = 0 THEN -o_totalprice
                      ELSE o_totalprice END AS price
          FROM base
          UNION ALL
          SELECT k, o_custkey, o_totalprice FROM base WHERE k % 101 = 0)
        SELECT "check", violations FROM (
          SELECT 'not_null(o_custkey)' AS "check",
                 CAST(count(*) FILTER (ck IS NULL) AS BIGINT) AS violations
          FROM mut
          UNION ALL
          SELECT 'unique(o_orderkey)',
                 CAST(coalesce(sum(n - 1), 0) AS BIGINT)
          FROM (SELECT count(*) AS n FROM mut GROUP BY k HAVING count(*) > 1)
          UNION ALL
          SELECT 'in_range(o_totalprice,0.0,1000000.0)',
                 CAST(count(*) FILTER (price IS NOT NULL
                      AND (price < 0.0 OR price > 1000000.0)) AS BIGINT)
          FROM mut
          UNION ALL
          SELECT 'ref(o_custkey)',
                 CAST(count(*) AS BIGINT)
          FROM mut WHERE ck IS NOT NULL
            AND ck NOT IN (SELECT c_custkey FROM customer))
        ORDER BY "check" """)),

    // ---- q107: INCREMENTAL VIEW MAINTENANCE from the change feed —
    // the consumer contract of readChangeFeed under the hash gate: a
    // (count, sum) aggregate materialized at an early snapshot is
    // advanced by delta-folding ONE feed spanning append + UPDATE
    // (retract pre-image, assert post-image) + DELETE (retract) +
    // COMPACT (net zero), with no rescan of table history — and must
    // equal the oracle's direct recompute of the final state. At
    // 100 TB this is a view refresh costing O(changed partitions),
    // not O(table). ----
    Q("q107_warehouse_incremental_view",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val whDir = graft.util.Scratch.dir("graft-q107-").toString
        val schema = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("val", DoubleType)))
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          retainReplaced = true,
          specs = Map("t" -> graft.pipeline.Warehouse.TableSpec(schema,
            statColumns = Seq("id"))))
        wh.bootstrap()
        val src = t(s, dir, "orders").select(col("o_orderkey").as("id"),
          concat(lit("g"), col("o_orderkey") % 10).as("grp"),
          col("o_totalprice").as("val"))
        wh.append("t", src.where(col("id") % 3 === 0))
        val snapV = wh.versions("t").max
        val state0 = graft.pipeline.MaterializedView
          .initAgg(wh.read("t"), Seq("grp"), "val").localCheckpoint()
        wh.append("t", src.where(col("id") % 3 === 1))
        wh.update("t", col("grp") === "g4", Map("val" -> (col("val") + 500.0)))
        wh.delete("t", col("id") % 11 === 0)
        wh.compact("t")
        graft.pipeline.MaterializedView.foldAgg(state0,
            wh.readChangeFeed("t", snapV), Seq("grp"), "val")
          .select(col("grp"), col("n_rows"),
            round(col("total"), 2).as("total"))
          .orderBy("grp")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 10) AS grp,
                 o_totalprice AS "val"
          FROM orders WHERE o_orderkey % 3 IN (0, 1)),
        upd AS (
          SELECT id, grp,
                 CASE WHEN grp = 'g4' THEN "val" + 500 ELSE "val" END AS "val"
          FROM src),
        del AS (SELECT * FROM upd WHERE id % 11 <> 0)
        SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum("val"), 2) AS total
        FROM del GROUP BY grp ORDER BY grp"""))  ,

    // ---- q108: SQL DDL + the reference's EP3 ingest shape, statements
    // only — CREATE TABLE (with the reference's PRIMARY KEY syntax,
    // script.py:77-83) routed through the injected parser to
    // Warehouse.createTable, then the fetch_space_weather load twice:
    // full first load, then an overlapping second load inserting ONLY
    // new dates via a NOT IN subquery that reads the same warehouse
    // table (script.py:84-92's anti-join, as one SQL statement). The
    // oracle recomputes the final table directly — any double-insert of
    // the overlap, broken DDL routing, or stale subquery read breaks
    // the hash. ----
    Q("q108_warehouse_sql_ddl",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q108-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("ep3_")
        t(s, dir, "orders").createOrReplaceTempView("ep3_orders_src")
        s.sql("""CREATE TABLE IF NOT EXISTS ep3_fact_space_weather (
                   date_utc DATE PRIMARY KEY,
                   f10_7_flux DOUBLE
                 )""")
        s.sql("""
          INSERT INTO ep3_fact_space_weather
          SELECT CAST(o_orderdate AS DATE) AS date_utc,
                 round(sum(o_totalprice) / 1000, 2) AS f10_7_flux
          FROM ep3_orders_src WHERE year(o_orderdate) = 1995
          GROUP BY CAST(o_orderdate AS DATE)
        """)
        s.sql("""
          INSERT INTO ep3_fact_space_weather
          SELECT CAST(o_orderdate AS DATE) AS date_utc,
                 round(sum(o_totalprice) / 1000, 2) AS f10_7_flux
          FROM ep3_orders_src
          WHERE year(o_orderdate) IN (1995, 1996)
            AND CAST(o_orderdate AS DATE) NOT IN
                (SELECT date_utc FROM ep3_fact_space_weather)
          GROUP BY CAST(o_orderdate AS DATE)
        """)
        s.sql("""SELECT date_utc, f10_7_flux FROM ep3_fact_space_weather
                 ORDER BY date_utc""")
      },
      Some("""
        SELECT CAST(o_orderdate AS DATE) AS date_utc,
               round(sum(o_totalprice) / 1000, 2) AS f10_7_flux
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        GROUP BY CAST(o_orderdate AS DATE)
        ORDER BY date_utc"""))  ,

    // ---- q110: CHECK constraints under the gate — ALTER TABLE ADD
    // CONSTRAINT declares an invariant, then two statements that would
    // violate it (a batch with planted bad rows, an UPDATE whose SET
    // result breaks the cap) are REJECTED atomically while compliant
    // DML lands. The hash is the enforcement proof: if a violating
    // write ever committed (or a valid one were wrongly blocked), the
    // final table would differ from the oracle's valid-rows-only
    // recompute. ----
    Q("q110_warehouse_check_constraints",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q110-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("chk110_")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"),
            concat(lit("g"), col("o_orderkey") % 10).as("grp"),
            // plant violations: every 13th row arrives negated
            when(col("o_orderkey") % 13 === 0, -col("o_totalprice"))
              .otherwise(col("o_totalprice")).as("val"))
          .createOrReplaceTempView("chk110_src")
        s.sql("""CREATE TABLE chk110_t (
                   id BIGINT, grp STRING, val DOUBLE)""")
        s.sql("ALTER TABLE chk110_t ADD CONSTRAINT val_nonneg " +
          "CHECK (val >= 0)")
        s.sql("INSERT INTO chk110_t SELECT * FROM chk110_src " +
          "WHERE val >= 0") // compliant load lands
        try { // the dirty batch must be rejected whole
          s.sql("INSERT INTO chk110_t SELECT * FROM chk110_src " +
            "WHERE id % 2 = 0")
        } catch { case _: graft.pipeline.Warehouse.CheckViolation => () }
        try { // SET result would break the invariant on matching rows
          s.sql("UPDATE chk110_t SET val = val - 2000000 WHERE grp = 'g7'")
        } catch { case _: graft.pipeline.Warehouse.CheckViolation => () }
        s.sql("UPDATE chk110_t SET val = val + 1 WHERE grp = 'g5'")
        s.sql("""SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
                        round(sum(val), 2) AS total
                 FROM chk110_t GROUP BY grp ORDER BY grp""")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey AS id, 'g' || (o_orderkey % 10) AS grp,
                 CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice
                      ELSE o_totalprice END AS "val"
          FROM orders),
        kept AS (SELECT * FROM src WHERE "val" >= 0),
        upd AS (
          SELECT id, grp,
                 CASE WHEN grp = 'g5' THEN "val" + 1 ELSE "val" END AS "val"
          FROM kept)
        SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum("val"), 2) AS total
        FROM upd GROUP BY grp ORDER BY grp"""))  ,

    // ---- q111: INSERT OVERWRITE + TRUNCATE TABLE under the gate —
    // the blind-replace statements (pandas' if_exists='replace', the
    // reference sink's other mode): full load, atomic OVERWRITE with a
    // transformed subset, TRUNCATE, reload of a different slice. The
    // oracle recomputes only the final slice — a leaked pre-overwrite
    // row, a partial replace, or a half-truncate breaks the hash. ----
    Q("q111_warehouse_overwrite_truncate",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q111-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("ow_")
        t(s, dir, "orders")
          .select(col("o_orderkey").as("id"),
            concat(lit("g"), col("o_orderkey") % 10).as("grp"),
            col("o_totalprice").as("val"),
            year(col("o_orderdate")).as("yr"))
          .createOrReplaceTempView("ow_src")
        s.sql("CREATE TABLE ow_t (id BIGINT, grp STRING, val DOUBLE)")
        s.sql("INSERT INTO ow_t SELECT id, grp, val FROM ow_src")
        s.sql("INSERT OVERWRITE ow_t " +
          "SELECT id, grp, val * 2 FROM ow_src WHERE yr = 1995")
        s.sql("TRUNCATE TABLE ow_t")
        s.sql("INSERT INTO ow_t SELECT id, grp, val FROM ow_src " +
          "WHERE yr = 1996")
        s.sql("""SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
                        round(sum(val), 2) AS total
                 FROM ow_t GROUP BY grp ORDER BY grp""")
      },
      Some("""
        SELECT 'g' || (o_orderkey % 10) AS grp,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1996
        GROUP BY 1 ORDER BY grp"""))  ,

    // ---- q131: the MATERIALIZED VIEW statement surface, statements
    // only (the q108 discipline applied to q129's lifecycle): CREATE
    // MATERIALIZED VIEW over a warehouse table, a second INSERT +
    // REFRESH (insert-fold), a DELETE + REFRESH (min forces the
    // rebuild path), then SELECT on the VIEW NAME — which must resolve
    // to the view CONTENTS, not the internal partial-state table. The
    // oracle recomputes the aggregate directly over the survivor set;
    // a stale watermark, a missed retraction, raw-state leakage
    // through the read route, or a lost view definition all break the
    // hash. ----
    Q("q131_warehouse_sql_matview",
      (s, dir) => {
        val whDir = graft.util.Scratch.dir("graft-q131-").toString
        val wh = new graft.pipeline.Warehouse(s, s"$whDir/wh",
          specs = Map.empty[String, graft.pipeline.Warehouse.TableSpec])
        wh.registerSql("mvq_")
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .createOrReplaceTempView("mvq_src")
        s.sql("CREATE TABLE mvq_docs (doc_id BIGINT, lang STRING, " +
          "n_chars BIGINT)")
        s.sql("INSERT INTO mvq_docs SELECT * FROM mvq_src " +
          "WHERE doc_id % 3 <> 0")
        s.sql("CREATE MATERIALIZED VIEW mvq_stats AS " +
          "SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars, " +
          "avg(n_chars) AS avg_chars, min(n_chars) AS min_chars " +
          "FROM mvq_docs GROUP BY lang")
        s.sql("INSERT INTO mvq_docs SELECT * FROM mvq_src " +
          "WHERE doc_id % 3 = 0")
        s.sql("REFRESH MATERIALIZED VIEW mvq_stats") // insert fold
        s.sql("DELETE FROM mvq_docs WHERE doc_id % 11 = 0")
        s.sql("REFRESH MATERIALIZED VIEW mvq_stats") // min ⇒ rebuild
        s.sql("""SELECT lang, n_docs, sum_chars,
                        round(avg_chars, 2) AS avg_chars, min_chars
                 FROM mvq_stats ORDER BY lang""")
      },
      Some("""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               round(avg(n_chars), 2) AS avg_chars,
               CAST(min(n_chars) AS BIGINT) AS min_chars
        FROM documents WHERE doc_id % 11 <> 0
        GROUP BY lang ORDER BY lang"""))
  )
}

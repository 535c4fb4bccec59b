package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** The SQL STATEMENT surface (graft.sql): INSERT / UPDATE / DELETE /
  * MERGE INTO / VERSION AS OF / DESCRIBE HISTORY / RESTORE / VACUUM
  * routed through the injected parser to the Warehouse API, plus the
  * always-current SELECT semantics and the fail-fast contract for
  * unsupported merge shapes.
  */
class WarehouseSqlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  private def fresh(retain: Boolean = false): Warehouse = {
    val dir = Files.createTempDirectory("graft-sqlwh-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = retain,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    // distinct prefix: the registry is session-scoped and parse-time
    // routing shadows same-named temp views, so suites sharing the
    // session must not reuse each other's names
    wh.registerSql("sdml_")
    wh
  }

  private def srcView(): Unit =
    (1L to 20L).map(i => (i, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "val").createOrReplaceTempView("sdml_src")

  test("INSERT INTO appends; SELECT always sees the latest commit") {
    val wh = fresh()
    srcView()
    // positional form
    spark.sql("INSERT INTO sdml_t SELECT id, grp, val FROM sdml_src WHERE id <= 10")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 10L)
    // explicit-columns form; no re-registration between statements —
    // reads resolve the manifest at statement time
    spark.sql("INSERT INTO sdml_t (id, grp, val) " +
      "SELECT id, grp, val FROM sdml_src WHERE id > 10")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 20L)
    assert(wh.history("t").last._2("op") === "append")
    // a same-prefix name that is NOT registered stays a plain temp view
    assert(spark.sql("SELECT count(*) FROM sdml_src").head().getLong(0) === 20L)
  }

  test("UPDATE and DELETE: row counts returned, subqueries routed") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    // SET expression over the OLD row; WHERE with alias qualifier
    val updated = spark.sql(
      "UPDATE sdml_t SET val = val + 100 WHERE sdml_t.id % 2 = 0")
      .head().getLong(0)
    assert(updated === 10L)
    assert(spark.sql("SELECT sum(val) FROM sdml_t WHERE id = 4")
      .head().getDouble(0) === 104.0)
    // DELETE with an IN-subquery that itself reads the warehouse table
    val deleted = spark.sql(
      "DELETE FROM sdml_t WHERE id IN (SELECT id FROM sdml_t WHERE val > 115)")
      .head().getLong(0)
    assert(deleted === 3L) // ids 16, 18, 20 (116, 118, 120)
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 17L)
    // SQL three-valued semantics: a null-yielding predicate keeps rows
    val noop = spark.sql("DELETE FROM sdml_t WHERE CAST(NULL AS BOOLEAN)")
      .head().getLong(0)
    assert(noop === 0L)
  }

  test("MERGE INTO runs the full clause set through one commit") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 10")
    Seq((2L, "gX", -1.0), (3L, "gY", 30.0), (11L, "gZ", 110.0),
      (12L, "gW", 120.0))
      .toDF("id", "grp", "val").createOrReplaceTempView("sdml_batch")
    spark.sql("""
      MERGE INTO sdml_t AS t USING sdml_batch AS s ON t.id = s.id
      WHEN MATCHED AND s.val < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET grp = s.grp, val = s.val + t.val
      WHEN NOT MATCHED AND s.id % 2 = 0 THEN INSERT *
    """)
    val rows = spark.sql("SELECT id, grp, val FROM sdml_t ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(!rows.exists(_._1 == 2L), "matched delete missed")
    assert(rows.contains((3L, "gY", 33.0)), "matched update missed")
    assert(rows.contains((12L, "gW", 120.0)), "conditional insert missed")
    assert(!rows.exists(_._1 == 11L), "insert condition ignored")
    assert(rows.size === 10) // 10 - 1 deleted + 1 inserted
    // merge #2: UPDATE SET * and the explicit same-name INSERT spelling
    Seq((3L, "gS", 300.0), (13L, "gN", 130.0))
      .toDF("id", "grp", "val").createOrReplaceTempView("sdml_batch")
    spark.sql("""
      MERGE INTO sdml_t USING sdml_batch s ON sdml_t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT (id, grp, val) VALUES (s.id, s.grp, s.val)
    """)
    val rows2 = spark.sql("SELECT id, grp, val FROM sdml_t ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows2.contains((3L, "gS", 300.0)), "SET * missed")
    assert(rows2.contains((13L, "gN", 130.0)), "explicit INSERT missed")
    assert(rows2.size === 11)
  }

  test("MERGE INTO ... WHEN NOT MATCHED BY SOURCE syncs target to source") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 10")
    // the classic full-sync shape: upsert everything the source has,
    // age out what it no longer has (conditionally), flag the rest
    Seq((3L, "gU", 300.0), (11L, "gI", 110.0))
      .toDF("id", "grp", "val").createOrReplaceTempView("sdml_batch")
    spark.sql("""
      MERGE INTO sdml_t AS t USING sdml_batch AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.val > 8 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.id % 2 = 0 THEN UPDATE
        SET grp = concat(grp, '-stale'), val = -val
    """)
    val rows = spark.sql("SELECT id, grp, val FROM sdml_t ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows.contains((3L, "gU", 300.0)), "matched SET * missed")
    assert(rows.contains((11L, "gI", 110.0)), "insert missed")
    assert(!rows.exists(r => r._1 == 9L || r._1 == 10L),
      "by-source delete missed (val 9, 10 > 8)")
    assert(rows.contains((2L, "g2-stale", -2.0)),
      "by-source update missed (unmatched even id)")
    assert(rows.contains((1L, "g1", 1.0)),
      "unmatched odd id under the delete bar must pass through")
    // delete wins over update for rows both conditions claim (id 10 was
    // even AND val > 8): Delta's by-source clause order, delete first
    assert(rows.size === 9) // 10 - 2 deleted + 1 inserted
  }

  test("VERSION AS OF, DESCRIBE HISTORY, RESTORE, VACUUM") {
    fresh(retain = true)
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 5") // v2
    spark.sql("UPDATE sdml_t SET val = 0 WHERE id > 3")                  // v3
    assert(spark.sql("SELECT sum(val) FROM sdml_t").head().getDouble(0) === 6.0)
    // time travel reads the pre-update snapshot (1+2+3+4+5)
    assert(spark.sql("SELECT sum(val) FROM sdml_t VERSION AS OF 2")
      .head().getDouble(0) === 15.0)
    val hist = spark.sql("DESCRIBE HISTORY sdml_t")
      .as[(Long, String, String)].collect().toSeq
    assert(hist.map(_._2) === Seq("bootstrap", "append", "update"))
    spark.sql("RESTORE sdml_t TO VERSION AS OF 2") // v4 = v2's files
    assert(spark.sql("SELECT sum(val) FROM sdml_t").head().getDouble(0) === 15.0)
    // vacuum keeps the latest manifest only; count is the GC'd orphans
    val vac = spark.sql("VACUUM sdml_t RETAIN 1 VERSIONS").head().getLong(0)
    assert(vac >= 1L, s"expected the v3 rewrite's files GC'd, got $vac")
    assert(spark.sql("SELECT sum(val) FROM sdml_t").head().getDouble(0) === 15.0)
  }

  test("VALUES insert, CTE reads, and non-registered names pass through") {
    val wh = fresh()
    // INSERT ... VALUES (inline table through the same append route)
    spark.sql("INSERT INTO sdml_t VALUES (1, 'g1', 1.5), (2, 'g2', 2.5)")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 2L)
    // warehouse relations inside CTEs and subqueries route too
    assert(spark.sql("""
      WITH big AS (SELECT id, val FROM sdml_t WHERE val > 2)
      SELECT count(*) FROM big
        WHERE id IN (SELECT id FROM sdml_t)""").head().getLong(0) === 1L)
    // a non-registered temp view keeps stock Spark semantics: reads work,
    // DML against it fails in Spark's own analyzer (not our router)
    Seq((1L, 2.0)).toDF("id", "v").createOrReplaceTempView("sdml_plain")
    assert(spark.sql("SELECT count(*) FROM sdml_plain").head().getLong(0) === 1L)
    // stock Spark rejects DML on a plain view (exception class varies
    // by version; the point is it is NOT routed to any warehouse)
    intercept[Exception] {
      spark.sql("DELETE FROM sdml_plain WHERE id = 1")
    }
    // Delta-style maintenance syntax on unregistered names falls through
    // to the delegate (which errors in its own way - never our router)
    intercept[Exception] {
      spark.sql("DESCRIBE HISTORY sdml_plain")
    }
    assert(wh.history("t").size === 2) // bootstrap + one insert
  }

  test("unsupported merge shapes fail at parse with a named limit") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 5")
    Seq((1L, "g", 1.0)).toDF("id", "grp", "val")
      .createOrReplaceTempView("sdml_batch")
    // by-source clauses see only target columns: a source reference in
    // the condition or SET value is a parse-time error, not a null
    val bySrcRef = intercept[IllegalArgumentException] {
      spark.sql("""
        MERGE INTO sdml_t t USING sdml_batch s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE AND s.val > 0 THEN DELETE
      """)
    }
    assert(bySrcRef.getMessage.contains("only target columns"))
    val bySrcSet = intercept[IllegalArgumentException] {
      spark.sql("""
        MERGE INTO sdml_t t USING sdml_batch s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET val = s.val
      """)
    }
    assert(bySrcSet.getMessage.contains("only target columns"))
    val crossNamed = intercept[IllegalArgumentException] {
      spark.sql("""
        MERGE INTO sdml_t t USING sdml_batch s ON t.id = s.val
        WHEN MATCHED THEN DELETE
      """)
    }
    assert(crossNamed.getMessage.contains("same-named"))
    val computed = intercept[IllegalArgumentException] {
      spark.sql("""
        MERGE INTO sdml_t t USING sdml_batch s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, grp, val) VALUES (s.id, s.grp, s.val + 1)
      """)
    }
    assert(computed.getMessage.contains("INSERT values"))
    // (INSERT OVERWRITE graduated from named limit to a supported
    // statement — see the overwrite/truncate test)
  }

  test("CREATE TABLE: DDL creates, routes, partitions, and is idempotent") {
    val wh = fresh()
    srcView()
    val created = spark.sql(
      """CREATE TABLE sdml_events (
           ev_id BIGINT, kind STRING, score DECIMAL(10,2),
           PRIMARY KEY (ev_id)
         ) PARTITIONED BY (kind)""").head().getBoolean(0)
    assert(created)
    // the new name routes immediately — full DML lifecycle via SQL only
    spark.sql("INSERT INTO sdml_events " +
      "SELECT id, grp, CAST(val AS DECIMAL(10,2)) FROM sdml_src")
    assert(spark.sql("SELECT count(*) FROM sdml_events").head().getLong(0) === 20L)
    assert(wh.partitioning("events") === Seq("kind"))
    // the partition layout is real: per-kind row counts survive it
    assert(wh.read("events").where($"kind" === "g1").count() === 7L)
    // PK advisory metadata surfaces in DESCRIBE HISTORY
    val hist = spark.sql("DESCRIBE HISTORY sdml_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(hist.exists { case (v, op, d) =>
      op == "bootstrap" && d.contains("pk=ev_id") })
    // IF NOT EXISTS: second create is a visible no-op
    assert(!spark.sql("CREATE TABLE IF NOT EXISTS sdml_events (x INT)")
      .head().getBoolean(0))
    // without IF NOT EXISTS: fail fast
    val dup = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE sdml_events (x INT)")
    }
    assert(dup.getMessage.contains("already exists"))
    // malformed body with a matched prefix fails loudly, never silently
    // falling through to the delegate's catalog CREATE TABLE
    val bad = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE sdml_bad (a INT) USING parquet")
    }
    assert(bad.getMessage.contains("unsupported clause"))
  }

  test("OPTIMIZE statement compacts; ZORDER BY variant re-clusters") {
    val wh = fresh()
    srcView()
    // two appends → two files; plain OPTIMIZE folds them into one
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 10")
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id > 10")
    val r = spark.sql("OPTIMIZE sdml_t").head()
    assert(r.getLong(1) > r.getLong(2) && r.getLong(2) === 1L,
      s"expected many files -> 1, got $r")
    // the z-order variant routes through the same statement; results
    // unchanged (layout-only), table still fully readable
    spark.sql("OPTIMIZE sdml_t ZORDER BY (id)")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 20L)
    assert(spark.sql("SELECT sum(id) FROM sdml_t").head().getLong(0) === 210L)
    // unsupported z-order type fails with a named limit
    val bad = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE sdml_t ZORDER BY (grp)")
    }
    assert(bad.getMessage.contains("unsupported type"))
  }

  test("INSERT OVERWRITE replaces atomically; TRUNCATE empties; both " +
    "time-travelable") {
    fresh(retain = true)                                           // v1
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")         // v2
    spark.sql("INSERT OVERWRITE sdml_t " +
      "SELECT * FROM sdml_src WHERE id <= 5")                      // v3
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 5L)
    // the replaced snapshot stays readable under retention
    assert(spark.sql("SELECT count(*) FROM sdml_t VERSION AS OF 2")
      .head().getLong(0) === 20L)
    val hist = spark.sql("DESCRIBE HISTORY sdml_t").collect()
    assert(hist.map(_.getString(1)).contains("overwrite"))
    spark.sql("TRUNCATE TABLE sdml_t")                             // v4
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 0L)
    // constraints bind the overwrite path too: a violating replace is
    // rejected whole and the table keeps its (empty) contents
    spark.sql("ALTER TABLE sdml_t ADD CONSTRAINT pos CHECK (val >= 0)")
    intercept[graft.pipeline.Warehouse.CheckViolation] {
      spark.sql("INSERT OVERWRITE sdml_t SELECT id, grp, -val FROM sdml_src")
    }
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 0L)
    // and a compliant overwrite lands after the rejection
    spark.sql("INSERT OVERWRITE sdml_t SELECT * FROM sdml_src WHERE id > 15")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 5L)
  }

  test("ALTER TABLE ADD COLUMN evolves the schema via SQL") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 5")
    spark.sql("ALTER TABLE sdml_t ADD COLUMN tag STRING")
    assert(wh.tables("t").fieldNames.contains("tag"))
    // pre-evolution rows read null; post-evolution inserts carry it
    spark.sql("INSERT INTO sdml_t SELECT id, grp, val, 'new' " +
      "FROM sdml_src WHERE id > 15")
    val got = spark.sql(
      "SELECT count(*) FILTER (WHERE tag IS NULL), " +
        "count(*) FILTER (WHERE tag = 'new') FROM sdml_t").head()
    assert(got.getLong(0) === 5L && got.getLong(1) === 5L)
    // parametrized types parse through Spark's DDL grammar
    spark.sql("ALTER TABLE sdml_t ADD COLUMN score DECIMAL(10,2)")
    assert(wh.tables("t")("score").dataType.typeName.startsWith("decimal"))
    val bad = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE sdml_t ADD COLUMN broken NOTATYPE(")
    }
    assert(bad.getMessage.contains("cannot parse type"))
  }

  test("CREATE TABLE AS SELECT: schema from the query, loaded in one go") {
    val wh = fresh()
    srcView()
    val created = spark.sql(
      """CREATE TABLE sdml_summary AS
         SELECT grp, count(*) AS n, sum(val) AS total
         FROM sdml_src GROUP BY grp""").head().getBoolean(0)
    assert(created)
    assert(wh.tables("summary").fieldNames.toSeq === Seq("grp", "n", "total"))
    assert(spark.sql("SELECT count(*) FROM sdml_summary").head().getLong(0) === 3L)
    // the new name is a full citizen: DML routes against it
    spark.sql("DELETE FROM sdml_summary WHERE grp = 'g0'")
    assert(spark.sql("SELECT count(*) FROM sdml_summary").head().getLong(0) === 2L)
    // IF NOT EXISTS on an existing table: no create, NO reload
    assert(!spark.sql("CREATE TABLE IF NOT EXISTS sdml_summary AS " +
      "SELECT * FROM sdml_src").head().getBoolean(0))
    assert(spark.sql("SELECT count(*) FROM sdml_summary").head().getLong(0) === 2L)
    // CTAS can read warehouse tables through the routed FROM side
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 4")
    spark.sql("CREATE TABLE sdml_copy AS SELECT id, grp, val FROM sdml_t")
    assert(spark.sql("SELECT count(*) FROM sdml_copy").head().getLong(0) === 4L)
  }

  test("CTAS is ATOMIC: a crash mid-load leaves no committed table, " +
      "and the re-run loads instead of skipping") {
    val wh = fresh()
    srcView()
    wh.crashPoint = Some("after-write")
    intercept[IllegalStateException] {
      spark.sql("CREATE TABLE sdml_part AS SELECT * FROM sdml_src")
    }
    wh.crashPoint = None
    // the create rolled back WITH the load: no phantom empty table that
    // an IF NOT EXISTS re-run would silently skip the load of
    assert(!wh.tables.contains("part"),
      "crashed CTAS left a created (empty) table behind")
    val created = spark.sql(
      "CREATE TABLE IF NOT EXISTS sdml_part AS SELECT * FROM sdml_src")
      .head().getBoolean(0)
    assert(created, "re-run after crash must CREATE, not no-op")
    assert(spark.sql("SELECT count(*) FROM sdml_part").head().getLong(0) === 20L)
    // create + first load are ONE commit: v1, op=ctas
    assert(wh.versions("part") === Seq(1L))
    assert(wh.history("part").head._2("op") === "ctas")
  }

  test("CREATE TABLE ... SHALLOW CLONE: statement routes, clone is " +
      "immediately addressable, source isolated") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 5")
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id > 5")
    // clone a PAST version (v2 = the first insert) by statement
    spark.sql("CREATE TABLE sdml_t2 SHALLOW CLONE sdml_t VERSION AS OF 2")
    assert(spark.sql("SELECT count(*) FROM sdml_t2").head().getLong(0) === 5L)
    // the clone takes DML; the source is isolated from it
    spark.sql("INSERT INTO sdml_t2 SELECT * FROM sdml_src WHERE id > 15")
    assert(spark.sql("SELECT count(*) FROM sdml_t2").head().getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 20L)
    // provenance in DESCRIBE HISTORY; clone listed by SHOW
    val ops = spark.sql("DESCRIBE HISTORY sdml_t2")
      .orderBy("version")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.head === "clone", ops)
    assert(spark.sql("SHOW WAREHOUSE TABLES")
      .where($"name" === "sdml_t2").count() === 1L)
    // unregistered source fails fast
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE sdml_t3 SHALLOW CLONE sdml_nope")
    }
    assert(err.getMessage.contains("not a registered warehouse table"))
  }

  test("DROP TABLE: the clone-cleanup half — clone dropped, source " +
      "intact, routes scoped to the dropped name") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    spark.sql("CREATE TABLE sdml_d2 SHALLOW CLONE sdml_t")
    spark.sql("INSERT INTO sdml_d2 SELECT * FROM sdml_src WHERE id <= 3")
    assert(spark.sql("SELECT count(*) FROM sdml_d2").head().getLong(0) === 23L)
    spark.sql("DROP TABLE sdml_d2")
    // the dropped name no longer resolves; the table is gone from the
    // warehouse; the SOURCE and its route are untouched
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM sdml_d2").collect()
    }
    assert(!wh.tables.contains("d2"))
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 20L)
    assert(spark.sql("SHOW WAREHOUSE TABLES")
      .where($"name" === "sdml_d2").count() === 0L)
    // a same-named re-clone starts from a clean slate
    spark.sql("CREATE TABLE sdml_d2 SHALLOW CLONE sdml_t")
    assert(spark.sql("SELECT count(*) FROM sdml_d2").head().getLong(0) === 20L)
    spark.sql("DROP TABLE sdml_d2")
    // unregistered names fall through to the delegate (temp views)
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("sdml_plainview")
    spark.sql("DROP TABLE IF EXISTS sdml_plainview") // delegate, no throw
    assert(wh.tables.contains("t"))
  }

  test("DROP TABLE and CREATE fix up EVERY registered session's " +
      "routes, not just the executing one") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    spark.sql("CREATE TABLE sdml_ms1 SHALLOW CLONE sdml_t")
    val other = spark.newSession()
    graft.sql.WarehouseSql.register(other, wh, "sdml_")
    assert(other.sql("SELECT count(*) FROM sdml_ms1").head().getLong(0) === 20L)
    // drop executes in the ORIGINAL session; the other session's route
    // must go too — the r7-ADVICE stale route would fail at SCAN time
    // (manifest gone) instead of failing to resolve
    spark.sql("DROP TABLE sdml_ms1")
    intercept[Exception] {
      other.sql("SELECT count(*) FROM sdml_ms1").collect()
    }
    // and a clone created in one session is immediately addressable
    // from the other (rerouteAll's other half)
    spark.sql("CREATE TABLE sdml_ms2 SHALLOW CLONE sdml_t")
    assert(other.sql("SELECT count(*) FROM sdml_ms2").head().getLong(0) === 20L)
    spark.sql("DROP TABLE sdml_ms2")
  }

  test("TIMESTAMP AS OF resolves to the newest commit at or before " +
      "the instant; VERSION AS OF unchanged") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 5")
    Thread.sleep(30) // fs modtime granularity fence between commits
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id > 5")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneId.of("UTC"))
    val tsBetween = fmt.format(java.time.Instant.ofEpochMilli(between))
    assert(spark.sql(
      s"SELECT count(*) FROM sdml_t TIMESTAMP AS OF '$tsBetween'")
      .head().getLong(0) === 5L)
    // a future instant = the current head; the API agrees
    val now = System.currentTimeMillis() + 60000
    assert(wh.readTimestamp("t", now).count() === 20L)
    assert(wh.versionAt("t", now) === wh.versions("t").max)
    // before the first commit: fail fast, not an empty table
    val err = intercept[IllegalArgumentException] {
      spark.sql("SELECT count(*) FROM sdml_t TIMESTAMP AS OF " +
        "'2000-01-01 00:00:00'").collect()
    }
    assert(err.getMessage.contains("no version committed"))
    // VERSION AS OF still routes
    assert(spark.sql("SELECT count(*) FROM sdml_t VERSION AS OF 2")
      .head().getLong(0) === 5L)
  }

  test("SHOW WAREHOUSE TABLES lists the session's routes from the " +
      "manifest, and empties after unregister") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    val rows = spark.sql("SHOW WAREHOUSE TABLES")
      .select("name", "table", "version", "num_files")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val t = rows.find(_._1 == "sdml_t").get
    assert(t._2 === "t")
    assert(t._3 === wh.versions("t").max) // head version, post-insert
    assert(t._4 >= 1L)
    // size_bytes reflects live manifest entries
    val bytes = spark.sql("SHOW WAREHOUSE TABLES")
      .where($"name" === "sdml_t").select("size_bytes")
      .head().getLong(0)
    assert(bytes > 0L)
    graft.sql.WarehouseSql.unregister(spark)
    // scope to this suite's prefix: suites share the session, so a
    // concurrently-running suite may hold routes of its own
    assert(spark.sql("SHOW WAREHOUSE TABLES")
      .where($"name".startsWith("sdml_")).count() === 0L)
    wh.registerSql("sdml_") // restore for later tests in the suite
  }

  test("unregister drops a session's routes and only that session's") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    graft.sql.WarehouseSql.unregister(spark)
    // the route is gone: the registered name no longer resolves
    val err = intercept[Exception] {
      spark.sql("SELECT count(*) FROM sdml_t").collect()
    }
    assert(err.getMessage.toLowerCase.contains("sdml_t") ||
      err.getMessage.toLowerCase.contains("table"))
    // re-registration restores the surface (idempotent lifecycle)
    wh.registerSql("sdml_")
    assert(spark.sql("SELECT count(*) FROM sdml_t").head().getLong(0) === 20L)
  }

  test("DESCRIBE DETAIL: manifest-backed metadata, no listing") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    spark.sql("ALTER TABLE sdml_t ADD CONSTRAINT pos CHECK (val >= 0)")
    val d = spark.sql("DESCRIBE DETAIL sdml_t").head()
    assert(d.getString(0) === "t")
    assert(d.getLong(1) === wh.versions("t").max)
    assert(d.getLong(2) > 0L && d.getLong(4) > 0L) // files, bytes
    assert(d.getLong(3) === 20L)                   // manifest row count
    assert(d.getAs[String]("stat_columns") === "id")
    assert(d.getAs[String]("checks") === "pos: val >= 0")
  }

  test("CREATE TABLE: the reference's verbatim DDL runs (empty prefix)") {
    val dir = Files.createTempDirectory("graft-sqlddl-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map.empty[String, Warehouse.TableSpec])
    wh.registerSql("") // claim unprefixed DDL for this warehouse
    // /root/reference/script.py:77-82, character for character
    spark.sql("""
                CREATE TABLE IF NOT EXISTS fact_space_weather (
                    date_utc DATE PRIMARY KEY,
                    f10_7_flux FLOAT
                );
            """)
    assert(wh.tables("fact_space_weather").fieldNames.toSeq ===
      Seq("date_utc", "f10_7_flux"))
    spark.sql("INSERT INTO fact_space_weather VALUES " +
      "(DATE'2026-01-01', CAST(101.5 AS FLOAT))")
    assert(spark.sql("SELECT f10_7_flux FROM fact_space_weather")
      .head().getFloat(0) === 101.5f)
    // re-running the reference's idempotent DDL is a no-op
    spark.sql("CREATE TABLE IF NOT EXISTS fact_space_weather " +
      "(date_utc DATE PRIMARY KEY, f10_7_flux FLOAT);")
    assert(spark.sql("SELECT count(*) FROM fact_space_weather")
      .head().getLong(0) === 1L)
  }

  test("CREATE/REFRESH/SELECT/DROP MATERIALIZED VIEW lifecycle") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id <= 10")
    val created = spark.sql(
      "CREATE MATERIALIZED VIEW sdml_mv AS SELECT grp, count(*) AS n, " +
        "sum(val) AS total, max(val) AS hi FROM sdml_t GROUP BY grp")
      .collect()
    assert(created.head.getString(0) === "mv")
    // SELECT on the view name reads the CONTENTS, not the state table
    val got = spark.sql(
        "SELECT grp, n, total, hi FROM sdml_mv ORDER BY grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    val want = spark.sql(
        "SELECT grp, count(*) AS n, sum(val) AS total, max(val) AS hi " +
          "FROM sdml_t GROUP BY grp ORDER BY grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got === want)
    // stale until refreshed; REFRESH brings it to the new source head
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src WHERE id > 10")
    assert(spark.sql("SELECT sum(n) FROM sdml_mv").head().getLong(0) === 10L)
    spark.sql("REFRESH MATERIALIZED VIEW sdml_mv")
    assert(spark.sql("SELECT sum(n) FROM sdml_mv").head().getLong(0) === 20L)
    // retracting DML triggers the min/max rebuild path on refresh
    spark.sql("DELETE FROM sdml_t WHERE id % 2 = 0")
    spark.sql("REFRESH MATERIALIZED VIEW sdml_mv")
    val got2 = spark.sql("SELECT grp, n, total, hi FROM sdml_mv ORDER BY grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    val want2 = spark.sql(
        "SELECT grp, count(*) AS n, sum(val) AS total, max(val) AS hi " +
          "FROM sdml_t GROUP BY grp ORDER BY grp")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got2 === want2)
    // definition survives a fresh registration (recovered from history)
    graft.sql.WarehouseSql.unregister(spark)
    wh.registerSql("sdml_")
    spark.sql("REFRESH MATERIALIZED VIEW sdml_mv") // watermark no-op
    assert(spark.sql("SELECT count(*) FROM sdml_mv").count() === 1L)
    // guards: refresh of a plain table fails; MV drops via its own verb
    val e = intercept[Exception] {
      spark.sql("REFRESH MATERIALIZED VIEW sdml_t") }
    assert(e.getMessage.contains("not a materialized view"))
    spark.sql("DROP MATERIALIZED VIEW sdml_mv")
    assert(!wh.tables.contains("mv"))
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS sdml_mv") // no-op
  }

  private def scans(df: org.apache.spark.sql.DataFrame,
      table: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString).exists(p =>
              p.endsWith(s"/$table") || p.contains(s"/$table/"))
          case _ => false
        }
    }.exists(identity)

  test("aggregate queries over the source are answered from a fresh " +
      "materialized view; stale or uncovered shapes scan the source") {
    fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    spark.sql("CREATE MATERIALIZED VIEW sdml_agg AS SELECT grp, " +
      "count(*) AS n, sum(val) AS total, avg(val) AS mean, " +
      "min(val) AS lo FROM sdml_t GROUP BY grp")
    // exact group match: Project over the view — the source is not
    // scanned at all
    val q = spark.sql("SELECT grp, count(*) AS n, sum(val) AS total, " +
      "avg(val) AS mean FROM sdml_t GROUP BY grp ORDER BY grp")
    assert(scans(q, "agg") && !scans(q, "t"))
    val direct = spark.sql("SELECT grp, n, total, mean FROM sdml_agg " +
      "ORDER BY grp").collect().toSeq
    assert(q.collect().toSeq === direct)
    // subset rollup: global count/sum/min re-aggregate the view
    val roll = spark.sql(
      "SELECT count(*) AS n, sum(val) AS total, min(val) AS lo " +
        "FROM sdml_t GROUP BY grp")
    // (grouped by grp, selecting no group col — still covered)
    assert(scans(roll, "agg") && !scans(roll, "t"))
    assert(roll.collect().map(_.getLong(0)).sum === 20L)
    // avg over a group SUBSET (here: global) is not answerable from the
    // view's finals — source scan
    val avgRoll = spark.sql("SELECT avg(val) AS m FROM sdml_t")
    assert(scans(avgRoll, "t"))
    // ...but global count/sum ARE (empty group set ⊂ {grp})
    val globalRoll = spark.sql(
      "SELECT count(*) AS n, sum(val) AS total FROM sdml_t")
    assert(scans(globalRoll, "agg") && !scans(globalRoll, "t"))
    assert(globalRoll.head().getLong(0) === 20L)
    assert(globalRoll.head().getDouble(1) === 210.0)
    // DISTINCT aborts the rewrite
    val dq = spark.sql("SELECT grp, count(DISTINCT val) AS n FROM sdml_t " +
      "GROUP BY grp")
    assert(scans(dq, "t"))
    // stale view: new source commit without refresh → source scan again
    spark.sql("INSERT INTO sdml_t SELECT id + 100, grp, val FROM sdml_src")
    val sq = spark.sql("SELECT grp, count(*) AS n FROM sdml_t GROUP BY grp")
    assert(scans(sq, "t") && !scans(sq, "agg"))
    assert(sq.collect().map(_.getLong(1)).sum === 40L)
    spark.sql("REFRESH MATERIALIZED VIEW sdml_agg")
    val fq = spark.sql("SELECT grp, count(*) AS n FROM sdml_t GROUP BY grp")
    assert(scans(fq, "agg"))
    assert(fq.collect().map(_.getLong(1)).sum === 40L)
    // kill switch
    spark.conf.set("spark.graft.mv.autoRewrite", "false")
    try assert(scans(spark.sql(
      "SELECT grp, count(*) AS n FROM sdml_t GROUP BY grp"), "t"))
    finally spark.conf.unset("spark.graft.mv.autoRewrite")
    // SHOW MATERIALIZED VIEWS: definition + freshness surface
    val shown = spark.sql("SHOW MATERIALIZED VIEWS")
      .where($"name" === "sdml_agg").collect()
    assert(shown.length === 1)
    val r = shown.head
    assert(r.getString(1) === "t" && r.getString(2) === "grp")
    assert(r.getString(3).contains("count(*) AS n"))
    assert(r.getBoolean(6), "view refreshed above - must be fresh")
  }

  /** No data file is opened at all — the optimized plan has no relation
    * over the table's directory (stronger than [[scans]]' negation
    * alone: we also require a LocalRelation carrying the answer). */
  private def metaOnly(df: org.apache.spark.sql.DataFrame,
      table: String): Boolean =
    !scans(df, table) && df.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        true
    }.nonEmpty

  test("global count/min/max are answered from the manifest without " +
      "opening a data file; DML keeps the answer exact; WHERE, " +
      "untracked columns and the kill switch fall back to a scan") {
    val wh = fresh()
    srcView()
    spark.sql("INSERT INTO sdml_t SELECT * FROM sdml_src")
    spark.sql("INSERT INTO sdml_t SELECT id + 100, grp, val FROM sdml_src")
    val q = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM sdml_t")
    assert(metaOnly(q, "t"))
    assert(q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))) === Seq((40L, 1L, 120L)))
    // copy-on-write DELETE rewrites files → manifest stays exact
    spark.sql("DELETE FROM sdml_t WHERE id > 110 OR id = 1")
    val afterDel = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM sdml_t")
    assert(metaOnly(afterDel, "t"))
    assert(afterDel.head() ===
      org.apache.spark.sql.Row(29L, 2L, 110L))
    // time travel pins the manifest snapshot — still metadata-only
    // (v1 bootstrap, v2/v3 the two inserts, v4 the delete)
    val tt = spark.sql(
      "SELECT count(*) AS n, max(id) AS hi FROM sdml_t VERSION AS OF 3")
    assert(metaOnly(tt, "t"))
    assert(tt.head() === org.apache.spark.sql.Row(40L, 120L))
    // un-aliased items keep Spark's auto names
    val bare = spark.sql("SELECT count(*), max(id) FROM sdml_t")
    assert(metaOnly(bare, "t"))
    assert(bare.columns.toSeq === Seq("count(1)", "max(id)"))
    // a predicate makes the manifest answer unknowable → scan
    val filtered = spark.sql("SELECT count(*) AS n FROM sdml_t WHERE id < 10")
    assert(scans(filtered, "t") && filtered.head().getLong(0) === 8L)
    // min/max of a column outside statsBy → scan, same answer
    val untracked = spark.sql("SELECT min(val) AS lo FROM sdml_t")
    assert(scans(untracked, "t") && untracked.head().getDouble(0) === 1.0)
    // count(col) needs a null count the footer stats don't carry → scan
    assert(scans(spark.sql("SELECT count(grp) AS n FROM sdml_t"), "t"))
    // kill switch
    spark.conf.set("spark.graft.metaOnlyAgg", "false")
    try assert(scans(spark.sql("SELECT count(*) AS n FROM sdml_t"), "t"))
    finally spark.conf.unset("spark.graft.metaOnlyAgg")
    // TRUNCATE: empty table answers count 0 / NULL extrema from metadata
    spark.sql("TRUNCATE TABLE sdml_t")
    val empty = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo FROM sdml_t")
    assert(metaOnly(empty, "t"))
    assert(empty.head() === org.apache.spark.sql.Row(0L, null))
    assert(wh.metaRowCount("t") === Some(0L))
  }

  test("count(*) GROUP BY partition columns is answered from partition " +
      "directories and footer counts, per-group min/max folds per " +
      "slice; HAVING, non-partition groups and partition-col extrema " +
      "fall back to a scan") {
    val dir = Files.createTempDirectory("graft-sqlwh-pmeta-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("p" -> Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("grp", StringType),
          StructField("yr", IntegerType),
          StructField("val", DoubleType))),
        partitionBy = Seq("grp", "yr"), statColumns = Seq("id"))))
    wh.bootstrap()
    wh.registerSql("smeta_")
    (1L to 30L).map(i => (i, s"g${i % 3}", 2020 + (i % 2).toInt, i * 1.0))
      .toDF("id", "grp", "yr", "val").createOrReplaceTempView("smeta_src")
    spark.sql("INSERT INTO smeta_p SELECT * FROM smeta_src")
    spark.sql("INSERT INTO smeta_p SELECT id + 100, grp, yr, val " +
      "FROM smeta_src WHERE grp = 'g1'")
    spark.sql("DELETE FROM smeta_p WHERE id = 3")
    // full partition-set grouping
    val q = spark.sql("SELECT grp, count(*) AS n, min(id) AS lo, " +
      "max(id) AS hi FROM smeta_p GROUP BY grp ORDER BY grp")
    assert(metaOnly(q, "p"))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq ===
      Seq(("g0", 9L, 6L, 30L), ("g1", 20L, 1L, 128L),
        ("g2", 10L, 2L, 29L)))
    // SUBSET of the partition columns, typed group value: the int year
    // decodes from the dir string through the scan path's own cast
    val byYr = spark.sql("SELECT yr, count(*) AS n, min(id) AS lo, " +
      "max(id) AS hi FROM smeta_p GROUP BY yr ORDER BY yr")
    assert(metaOnly(byYr, "p"))
    assert(byYr.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSeq ===
      Seq((2020, 20L, 2L, 128L), (2021, 19L, 1L, 125L)))
    // HAVING stays on the always-correct scan path (the Aggregate
    // under UnresolvedHaving must remain an Aggregate)
    val hv = spark.sql("SELECT grp, count(*) AS n FROM smeta_p " +
      "GROUP BY grp HAVING count(*) > 9 ORDER BY grp")
    assert(scans(hv, "p"))
    assert(hv.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g1", 20L), ("g2", 10L)))
    // non-partition group column → scan
    assert(scans(spark.sql(
      "SELECT val, count(*) AS n FROM smeta_p GROUP BY val"), "p"))
    // extrema of a partition column: dir-encoded, no footer stats → scan
    val pm = spark.sql("SELECT min(grp) AS lo FROM smeta_p")
    assert(scans(pm, "p") && pm.head().getString(0) === "g0")
  }

  test("adopted pre-existing files have no footer counts in the " +
      "manifest - metadata answers decline and the scan answers") {
    val dir = Files.createTempDirectory("graft-sqlwh-adopt-").toString
    // files land BEFORE the warehouse exists: bootstrap adopts the
    // listing verbatim, with no row counts and no stats
    (1L to 7L).map(i => (i, s"g$i", i * 1.0)).toDF("id", "grp", "val")
      .write.parquet(s"$dir/t")
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    wh.registerSql("sadopt_")
    assert(wh.metaRowCount("t") === None)
    assert(wh.metaMinMax("t", "id") === None)
    val q = spark.sql("SELECT count(*) AS n, max(id) AS hi FROM sadopt_t")
    assert(scans(q, "t"))
    assert(q.head() === org.apache.spark.sql.Row(7L, 7L))
    // the first REAL write replaces nothing, so the unknown-count files
    // remain live and the table stays scan-answered — correctness
    // never depends on the upgrade
    spark.sql("INSERT INTO sadopt_t SELECT 8, 'g8', 8.0")
    val q2 = spark.sql("SELECT count(*) AS n FROM sadopt_t")
    assert(scans(q2, "t") && q2.head().getLong(0) === 8L)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Relational operator surface: scans, filters, projections, equi/anti/
  * semi/outer joins, hash + rollup/cube/grouping-set aggregation, window
  * functions, top-k, set ops, subqueries, pivot, time windows (tumbling +
  * session), as-of join, range join, JSON extraction.
  *
  * The reference exercises a subset of these directly (SURVEY.md §2: anti
  * joins J1-J3, dedup D1, projections, filters); the rest are the
  * downstream "Analytics Ready" query surface (§2.10) the star schema
  * exists for. Each entry is paired with a DuckDB oracle (see Q's
  * conventions on ordering / rounding / type alignment).
  */
object CoreQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Register views then run a SQL-string query (used where the exercised
    * surface IS Spark's SQL front end: grouping sets, subqueries).
    */
  private def viaSql(names: Seq[String], sql: String)(
      s: SparkSession, dir: String): DataFrame = {
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** q61's CSV landing fixture, cached per (JVM, sf dir) like
    * TleQueries.q46Landing: it is a pure function of orders, and the
    * operator under the gate is the PERMISSIVE read, not the write.
    */
  private def q61Csv(s: SparkSession, dir: String): String =
    Fixtures.cached(s"q61:$dir") {
      import org.apache.spark.sql.functions.{col => c}
      val tmp = graft.util.Scratch.dir("graft-q61-")
        .toString
      val k = c("o_orderkey")
      val priceStr = format_string("%d.%d", c("o_custkey") % 1000, k % 100)
      val line = concat_ws(",", k, format_string("N%d", c("o_custkey")),
        when(k % 13 === 0, concat(priceStr, lit("X"))).otherwise(priceStr))
      t(s, dir, "orders")
        .repartition(s.sparkContext.defaultParallelism)
        .select(line.as("value")).write.mode("overwrite").text(s"$tmp/csv")
      s"$tmp/csv"
    }

  /** q174's JSON-lines landing fixture (cached like q61's CSV): one
    * JSON object per line, derived purely from orders, with BOTH
    * corruption modes the PERMISSIVE contract distinguishes — every
    * 13th record type-corrupt (price is a non-numeric STRING: the
    * record parses, the field doesn't) and every 17th structurally
    * corrupt (trailing `}` dropped: nothing parses).
    */
  private def q174Jsonl(s: SparkSession, dir: String): String =
    Fixtures.cached(s"q174:$dir") {
      import org.apache.spark.sql.functions.{col => c}
      val tmp = graft.util.Scratch.dir("graft-q174-").toString
      val k = c("o_orderkey")
      val priceStr = format_string("%d.%d", c("o_custkey") % 1000, k % 100)
      val price = when(k % 13 === 0,
        concat(lit("\""), priceStr, lit("X\""))).otherwise(priceStr)
      val line = format_string("""{"k":%d,"name":"N%d","price":%s}""",
        k, c("o_custkey"), price)
      val corrupted = when(k % 17 === 0,
        expr("substring(line, 1, length(line) - 1)")).otherwise(c("line"))
      t(s, dir, "orders")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("line", line)
        .select(corrupted.as("value"))
        .write.mode("overwrite").text(s"$tmp/jsonl")
      s"$tmp/jsonl"
    }

  /** q175's Avro landing fixture: container files written DISTRIBUTED
    * (one per partition, avro-core `DataFileWriter` in the task — the
    * same executor-side codec carrier the multimodal decoders use),
    * derived purely from orders. The writer schema carries `price` as
    * a nullable STRING (every 13th value non-numeric, every 19th a
    * genuine null — nulls and failed parses must stay distinguishable)
    * plus an `extra` field no query asks for, so the pruning spec can
    * assert Avro's schema resolution skips it.
    */
  private def q175Avro(s: SparkSession, dir: String): String =
    Fixtures.cached(s"q175:$dir") {
      val tmp = graft.util.Scratch.dir("graft-q175-").toString + "/avro"
      new java.io.File(tmp).mkdirs()
      val schemaJson =
        """{"type":"record","name":"order_line","fields":[
          |{"name":"k","type":"long"},
          |{"name":"name","type":"string"},
          |{"name":"price","type":["null","string"],"default":null},
          |{"name":"extra","type":"long"}]}""".stripMargin
      t(s, dir, "orders").selectExpr("o_orderkey", "o_custkey")
        .repartition(s.sparkContext.defaultParallelism)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          import org.apache.avro.generic.{GenericData, GenericDatumWriter,
            GenericRecord}
          val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
          val w = new org.apache.avro.file.DataFileWriter(
            new GenericDatumWriter[GenericRecord](schema))
          val pid = org.apache.spark.TaskContext.getPartitionId()
          w.create(schema, new java.io.File(f"$tmp/part-$pid%05d.avro"))
          try it.foreach { r =>
            val k = r.getLong(0); val ck = r.getLong(1)
            val rec = new GenericData.Record(schema)
            rec.put("k", k)
            rec.put("name", s"N$ck")
            rec.put("price",
              if (k % 19 == 0) null
              else {
                val p = s"${ck % 1000}.${k % 100}"
                if (k % 13 == 0) p + "X" else p
              })
            rec.put("extra", k * 2)
            w.append(rec)
          } finally w.close()
        }
      tmp
    }

  val all: Seq[Q] = Seq(

    // ---- q01: filtered scan + hash aggregation (TPC-H Q1 shape). ----
    // Partial aggregation (map-side combine) keeps the shuffle at
    // |groups| x |partitions| rows regardless of input scale.
    Q("q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .where($"l_shipdate" <= to_timestamp_ntz(lit("2000-12-01")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
            round(avg($"l_quantity"), 2).as("avg_qty"),
            round(avg($"l_extendedprice"), 2).as("avg_price"),
            round(avg($"l_discount"), 2).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 2) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: star join fact->dims, broadcast the small sides. ----
    // nation/region are O(10) rows at any scale factor: broadcast hash
    // join, no shuffle for them; only customer|><|orders|><|lineitem
    // shuffles, on their join keys.
    Q("q02_revenue_by_nation",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .where($"o_orderdate" >= to_timestamp_ntz(lit("1996-01-01")) &&
                 $"o_orderdate" < to_timestamp_ntz(lit("1998-01-01")))
        val l = t(s, dir, "lineitem")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          // Sum in the DECIMAL domain: double summation is
          // accumulation-order-dependent, and at some scale factors the
          // group total lands exactly on a half-cent where the two
          // engines' last-ulp difference flips round(_, 2). Per-item
          // double→decimal(18,6) conversion is deterministic and decimal
          // addition is exact and order-free, so the rounded total is
          // identical everywhere, at every scale.
          .agg(
            round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
              .cast("decimal(18,6)")), 2).cast("double").as("revenue"),
            count_distinct($"o_orderkey").as("n_orders"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- q03: top-k (agg + orderBy + limit => TakeOrderedAndProject:
    // per-partition heaps, only k rows cross to the driver). ----
    Q("q03_topk_orders_by_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // ---- q04: ranking window, top-n per group. ----
    Q("q04_top2_orders_per_customer",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .where($"rn" <= 2)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 2
        ORDER BY o_custkey, rn""")),

    // ---- q05: running-total window (streaming frame evaluation). ----
    Q("q05_running_qty_per_supplier",
      (s, dir) => {
        import s.implicits._
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // order by quantity too so running values are invariant under
        // permutation of remaining (full-duplicate) ties.
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity")
          .withColumn("running_qty", round(sum($"l_quantity").over(w), 2))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        FROM lineitem
        ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""")),

    // ---- q06: anti join — the reference's dedup primitive (SURVEY
    // §2.5 J1-J3, /root/reference/script.py:143). ----
    // Anti join with a pushed build-side filter. "No orders at all"
    // returns the empty set at every tested sf on this synthetic data
    // (the r12 audit flagged the gate as vacuously green), so the
    // predicate is "no URGENT orders" — 18/203/1986 rows at
    // sf0.001/0.01/0.1, making the hash compare load-bearing while
    // keeping the J1-shape anti join + right-side filter pushdown.
    Q("q06_customers_without_orders",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders").where($"o_orderpriority" === "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ---- q07: semi join (EXISTS). ----
    Q("q07_large_parts_shipped",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .where($"p_size" >= 25)
          .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_semi")
          .select($"p_partkey", $"p_name", $"p_size")
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_size
        FROM part
        WHERE p_size >= 25
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        ORDER BY p_partkey""")),

    // ---- q08: exact distinct (shuffle on full key; map-side partial
    // dedup keeps the exchange small). ----
    Q("q08_distinct_flag_status_year",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus",
            year($"l_shipdate").cast("long").as("ship_year"))
          .distinct()
          .orderBy($"l_returnflag", $"l_linestatus", $"ship_year")
      },
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus, ship_year""")),

    // ---- q09: set operations (INTERSECT then EXCEPT, both distinct). ----
    Q("q09_setops_custkeys",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        def keys(status: String) =
          o.where($"o_orderstatus" === status).select($"o_custkey")
        keys("F").intersect(keys("O")).except(keys("P"))
          .orderBy($"o_custkey")
      },
      Some("""
        SELECT o_custkey FROM
          ((SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        ORDER BY o_custkey""")),

    // ---- q10: rollup. ----
    Q("q10_rollup_returns",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("flag"),
            coalesce($"l_linestatus", lit("ALL")).as("status"),
            $"n", $"qty")
          .orderBy($"flag", $"status")
      },
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY flag, status""")),

    // ---- q11: cube. ----
    Q("q11_cube_order_status",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- q12: grouping sets (SQL front end). ----
    Q("q12_grouping_sets",
      viaSql(Seq("orders"), """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority"""),
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority""")),

    // ---- q13: tumbling event-time window (batch form of the streaming
    // windowed agg, SURVEY §2.11). ----
    Q("q13_events_hourly",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
          .select(
            unix_millis($"window.start").as("bucket_ms"),
            $"event_type", $"n", $"total_value")
          .orderBy($"bucket_ms", $"event_type")
      },
      Some("""
        SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_ms,
               event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket_ms, event_type""")),

    // ---- q14: session windows (gap = 6h). Spark merges while the next
    // event is strictly inside [start, last+gap); the oracle reproduces
    // that with gaps-and-islands. ----
    Q("q14_events_sessions",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id", session_window($"ts", "6 hours"))
          .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
          .select(
            $"user_id",
            unix_millis($"session_window.start").as("session_start_ms"),
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start_ms")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      < INTERVAL 6 HOUR THEN 0 ELSE 1 END AS new_session
          FROM ev),
        sessioned AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked)
        SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM sessioned
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start_ms""")),

    // ---- q15: as-of join (custom operator, see AsOfJoin). ----
    Q("q15_asof_last_error",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val left = ev.where($"event_type" =!= "error")
        val errors = ev.where($"event_type" === "error")
          .select($"user_id", $"ts", $"value")
        AsOfJoin.asof(left, errors, Seq("user_id"), "ts", Seq("ts", "value"), "err_")
          .select(
            $"event_id", $"user_id",
            unix_millis($"ts").as("ts_ms"),
            unix_millis($"err_ts").as("err_ts_ms"),
            $"err_value")
          .orderBy($"event_id")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
          FROM events),
        err AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'error')
        SELECT e.event_id, e.user_id,
               epoch_ms(e.ts) AS ts_ms,
               epoch_ms(r.ts) AS err_ts_ms,
               r.value AS err_value
        FROM (SELECT * FROM ev WHERE event_type <> 'error') e
        ASOF LEFT JOIN err r
          ON e.user_id = r.user_id AND e.ts >= r.ts
        ORDER BY e.event_id""")),

    // ---- q16: range (band) join — non-equi join against a tiny literal
    // dim: broadcast nested-loop, no shuffle of the fact side. ----
    Q("q16_price_band_totals",
      (s, dir) => {
        import s.implicits._
        val bands = s.createDataFrame(Seq(
          (1, 0.0, 25000.0), (2, 25000.0, 50000.0),
          (3, 50000.0, 75000.0), (4, 75000.0, 1e9)))
          .toDF("band_id", "lo", "hi")
        t(s, dir, "lineitem")
          .join(broadcast(bands),
            $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
          .groupBy($"band_id")
          .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy($"band_id")
      },
      Some("""
        SELECT band_id, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        JOIN (VALUES (1, 0.0, 25000.0), (2, 25000.0, 50000.0),
                     (3, 50000.0, 75000.0), (4, 75000.0, 1e9)) AS b(band_id, lo, hi)
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band_id
        ORDER BY band_id""")),

    // ---- q17: semi-structured JSON extraction (events.props). ----
    Q("q17_events_json_props",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), count($"k").as("n_with_k"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- q18: outer join + aggregation with null handling. ----
    Q("q18_customer_order_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey""")),

    // ---- q19: uncorrelated scalar subquery. ----
    Q("q19_orders_above_avg",
      viaSql(Seq("orders"), """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey""")),

    // ---- q20: correlated scalar subquery (Catalyst decorrelates to an
    // aggregate + join — no per-row re-execution at scale). ----
    Q("q20_above_nation_avg_balance",
      viaSql(Seq("customer"), """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey"""),
      Some("""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")),

    // ---- q21: pivot (statuses to columns). ----
    Q("q21_pivot_status_counts",
      (s, dir) => {
        import s.implicits._
        val p = t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        p.select($"o_orderpriority",
            coalesce($"F", lit(0L)).as("F"),
            coalesce($"O", lit(0L)).as("O"),
            coalesce($"P", lit(0L)).as("P"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus = 'F') AS "F",
               count(*) FILTER (o_orderstatus = 'O') AS "O",
               count(*) FILTER (o_orderstatus = 'P') AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q60: SLIDING event-time windows (2 h length, 1 h slide) —
    // the overlapping-window shape q13's tumbling form doesn't cover.
    // Spark's window() expands each event into its length/slide = 2
    // owning windows before the hash aggregation (one shuffle on
    // (window, key)); the oracle replays the same expansion as a
    // two-branch union on floor-divided epoch buckets. ----
    Q("q60_events_sliding_windows",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
          .select(
            unix_millis($"window.start").as("window_start_ms"),
            $"event_type", $"n", $"total_value")
          .orderBy("window_start_ms", "event_type")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type, value
          FROM events),
        w AS (
          SELECT (ms // 3600000) * 3600000 AS w_start, event_type, value
          FROM ev
          UNION ALL
          SELECT (ms // 3600000) * 3600000 - 3600000, event_type, value
          FROM ev)
        SELECT w_start AS window_start_ms, event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM w GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- q61: CSV source with PERMISSIVE per-record error policy —
    // the T5 contract (§2.3: record-level failure → null, never job
    // failure) on the CSV reader: every 13th row carries an unparseable
    // price; PERMISSIVE keeps the parseable fields, nulls the bad one,
    // and captures the raw line in the corrupt-record column. The
    // oracle re-derives the same rows relationally (the fixture is a
    // pure function of orders). ----
    Q("q61_csv_permissive",
      (s, dir) => {
        import s.implicits._
        s.read
          .schema("k long, name string, price double, _corrupt string")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(q61Csv(s, dir))
          .select($"k", $"name", $"price",
            $"_corrupt".isNotNull.as("corrupt"))
          .orderBy("k")
      },
      Some("""
        SELECT o_orderkey AS k,
               printf('N%d', o_custkey) AS name,
               CASE WHEN o_orderkey % 13 = 0 THEN NULL
                    ELSE CAST(printf('%d.%d', o_custkey % 1000,
                              o_orderkey % 100) AS DOUBLE) END AS price,
               o_orderkey % 13 = 0 AS corrupt
        FROM orders ORDER BY k""")),

    // ---- q62: ORC sink + source round-trip (columnar format #2):
    // write a lineitem projection to ORC, read it back with a pushable
    // predicate, aggregate. Pins the ORC type mapping and scan path
    // next to parquet (q01-) and JDBC (q52). ----
    Q("q62_orc_roundtrip",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q62-")
          .toString
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_returnflag", $"l_quantity",
            $"l_extendedprice")
          .write.mode("overwrite").orc(s"$tmp/orc")
        s.read.orc(s"$tmp/orc")
          .where($"l_quantity" > 25)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM lineitem WHERE l_quantity > 25
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q174: JSON-lines source with the PERMISSIVE per-record
    // error policy — the q61 (T5) contract on the format LLM-corpus
    // interchange actually uses. Two corruption modes, distinguished
    // exactly as Spark's JSON reader does: a TYPE-corrupt record
    // (well-formed JSON, non-numeric price string) keeps its parseable
    // fields, nulls the bad one, and captures the raw line in the
    // corrupt-record column; a STRUCTURALLY corrupt record (truncated
    // JSON) nulls every field and captures the raw line. The sort key
    // re-derives k from the raw capture for structural rows so the
    // output order is total in both engines; the oracle re-derives all
    // three row shapes relationally from orders. ----
    Q("q174_jsonl_permissive",
      (s, dir) => {
        import s.implicits._
        s.read
          .schema("k long, name string, price double, _corrupt string")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(q174Jsonl(s, dir))
          .select(
            coalesce($"k",
              regexp_extract($"_corrupt", "\"k\":(\\d+)", 1).cast("long"))
              .as("sk"),
            $"k", $"name", $"price",
            $"_corrupt".isNotNull.as("corrupt"))
          .orderBy("sk")
      },
      Some("""
        SELECT o_orderkey AS sk,
               CASE WHEN o_orderkey % 17 = 0 THEN NULL
                    ELSE o_orderkey END AS k,
               CASE WHEN o_orderkey % 17 = 0 THEN NULL
                    ELSE printf('N%d', o_custkey) END AS name,
               CASE WHEN o_orderkey % 17 = 0 OR o_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST(printf('%d.%d', o_custkey % 1000,
                              o_orderkey % 100) AS DOUBLE) END AS price,
               (o_orderkey % 17 = 0 OR o_orderkey % 13 = 0) AS corrupt
        FROM orders ORDER BY sk""")),

    // ---- q175: Avro source (custom DSv2 over avro-core — no
    // spark-avro connector ships here) with the same PERMISSIVE field
    // contract: the writer recorded price as a STRING; the read asks
    // for DOUBLE, so each value coerces null-on-failure with the raw
    // writer text captured in _corrupt. Genuine writer nulls (every
    // 19th) stay null WITHOUT a corrupt capture — null vs failed-parse
    // is part of the contract. Column pruning rides Avro's own
    // reader-schema resolution (AvroSourceSpec pins it). ----
    Q("q175_avro_permissive",
      (s, dir) => {
        import s.implicits._
        s.read.format("graft-avro")
          .schema("k long, name string, price double, _corrupt string")
          .load(q175Avro(s, dir))
          .select($"k", $"name", $"price",
            $"_corrupt".isNotNull.as("corrupt"))
          .orderBy("k")
      },
      Some("""
        SELECT o_orderkey AS k,
               printf('N%d', o_custkey) AS name,
               CASE WHEN o_orderkey % 19 = 0 OR o_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST(printf('%d.%d', o_custkey % 1000,
                              o_orderkey % 100) AS DOUBLE) END AS price,
               (o_orderkey % 13 = 0 AND o_orderkey % 19 <> 0) AS corrupt
        FROM orders ORDER BY k""")),

    // ---- q177: Avro sink + source ROUND-TRIP through the graft-avro
    // DSv2 write path (q62's ORC shape for the interchange format):
    // write a lineitem projection as container files (nullable unions,
    // timestamp-micros logical type), read it back, aggregate. Pins
    // the write→read type mapping end-to-end under the oracle. ----
    Q("q177_avro_roundtrip",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q177-").toString
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_returnflag", $"l_quantity",
            $"l_extendedprice", $"l_shipdate")
          .write.format("graft-avro").mode("overwrite").save(s"$tmp/avro")
        s.read.format("graft-avro").load(s"$tmp/avro")
          .where($"l_quantity" > 25)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum($"l_extendedprice"), 2).as("total"),
            max($"l_shipdate").cast("string").as("last_ship"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total,
               CAST(max(l_shipdate) AS VARCHAR) AS last_ship
        FROM lineitem WHERE l_quantity > 25
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q178: the streaming HALF of the Avro interchange path,
    // end-to-end under the oracle: the q175 container fixture streams
    // through graft-avro's micro-batch read (file-set offsets, same
    // PERMISSIVE coercion), lands in a scratch warehouse table through
    // the exactly-once graft-warehouse sink (AvailableNow drain), and
    // the TABLE is what the gate hashes — so offsets, coercion, epoch
    // fencing and the manifest commit all sit under one hash. Oracle =
    // q175's relational derivation (identical rows, different carrier).
    Q("q178_avro_stream_warehouse",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types.{BooleanType, DoubleType,
          LongType, StringType, StructField, StructType}
        val src = q175Avro(s, dir)
        val whDir = graft.util.Scratch.dir("graft-q178-").toString
        val wh = new graft.pipeline.Warehouse(s, whDir,
          specs = Map("landed" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("k", LongType),
              StructField("name", StringType),
              StructField("price", DoubleType),
              StructField("corrupt", BooleanType))))))
        wh.bootstrap()
        val q = s.readStream.format("graft-avro")
          .schema("k long, name string, price double, _corrupt string")
          .load(src)
          .select(col("k"), col("name"), col("price"),
            col("_corrupt").isNotNull.as("corrupt"))
          .writeStream.format("graft-warehouse")
          .option("path", whDir).option("table", "landed")
          .option("checkpointLocation", s"$whDir/_ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        wh.read("landed").orderBy("k")
      },
      Some("""
        SELECT o_orderkey AS k,
               printf('N%d', o_custkey) AS name,
               CASE WHEN o_orderkey % 19 = 0 OR o_orderkey % 13 = 0
                    THEN NULL
                    ELSE CAST(printf('%d.%d', o_custkey % 1000,
                              o_orderkey % 100) AS DOUBLE) END AS price,
               (o_orderkey % 13 = 0 AND o_orderkey % 19 <> 0) AS corrupt
        FROM orders ORDER BY k""")),

    // ---- q179: SPLIT read of ONE multi-block Avro container file —
    // the sync-marker byte-range scan under the hash gate. The whole
    // lineitem projection lands in a single container file
    // (coalesce(1) through the graft-avro sink), the read forces a
    // small splitSize so the scan plans many byte-range partitions
    // (require()d — a silent one-partition fallback fails the QUERY,
    // not just a spec), and the aggregate must equal DuckDB over the
    // parquet original: adjacent ranges cover every block exactly
    // once, no duplicated or lost rows. ----
    Q("q179_avro_split_scan",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q179-").toString
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_quantity",
            $"l_extendedprice")
          .coalesce(1)
          .write.format("graft-avro").mode("overwrite").save(s"$tmp/one")
        val split = s.read.format("graft-avro")
          .option("splitSize", 65536).load(s"$tmp/one")
        require(split.rdd.getNumPartitions > 1,
          "q179: the container file must split into byte-range partitions")
        split.groupBy(($"l_orderkey" % 10).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum($"l_quantity"), 2).as("qty"),
            round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy("bucket")
      },
      Some("""
        SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 2) AS qty,
               round(sum(l_extendedprice), 2) AS total
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- q180: Avro filter pushdown + per-file stats sidecar under
    // the gate. Two container landings with DISJOINT o_orderkey ranges
    // are indexed (writeIndex — one distributed stats pass, one tiny
    // _index.json); the selective read must SKIP the high-range file
    // at plan time (require()d via the skip counter — an index or
    // pushdown regression fails the query) and still return exactly
    // the relational answer, because pushdown is an I/O cut, never a
    // correctness gate (every filter stays residual). ----
    Q("q180_avro_stats_skip",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q180-").toString + "/land"
        val src = t(s, dir, "orders").select(
          $"o_orderkey".cast("long").as("k"),
          $"o_custkey".cast("long").as("ck"),
          $"o_totalprice".cast("double").as("price"))
        src.where($"k" <= 1000).coalesce(1)
          .write.format("graft-avro").mode("append").save(tmp)
        src.where($"k" > 1000).coalesce(1)
          .write.format("graft-avro").mode("append").save(tmp)
        graft.sources.AvroSource.writeIndex(s, tmp)
        val skips0 = graft.sources.AvroSource.skippedFiles.get()
        val out = s.read.format("graft-avro").load(tmp)
          .where($"k" <= 1000)
          .groupBy(($"k" % 7).cast("long").as("g"))
          .agg(count(lit(1)).as("n"),
            round(sum($"price"), 2).as("total"),
            max($"ck").as("max_ck"))
          .orderBy("g")
        require(out.rdd.partitions.length >= 1)
        require(graft.sources.AvroSource.skippedFiles.get() > skips0,
          "q180: the high-range container file must be stats-skipped " +
            "at plan time")
        out
      },
      Some("""
        SELECT CAST(o_orderkey % 7 AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(max(o_custkey) AS BIGINT) AS max_ck
        FROM orders WHERE o_orderkey <= 1000
        GROUP BY 1 ORDER BY 1""")),

    // ---- q181: embedding columns RIDE the Avro interchange — the
    // whole embeddings table (vec_id, array<float> embedding, label)
    // round-trips through graft-avro container files and the gate
    // hashes float-exact per-label aggregates: floor(x·1e6) pins the
    // element VALUES bit-for-bit (float→double widening is exact in
    // both engines), sum(size) pins array lengths, counts pin rows.
    // A corpus whose vectors can't ride the landing format would break
    // every downstream ANN/dedup stage; this keeps the carrier honest. ----
    Q("q181_avro_embeddings",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q181-").toString
        t(s, dir, "embeddings")
          .select($"vec_id", $"embedding", $"label")
          .write.format("graft-avro").mode("overwrite").save(s"$tmp/emb")
        s.read.format("graft-avro").load(s"$tmp/emb")
          .groupBy($"label".cast("long").as("label"))
          .agg(count(lit(1)).as("n"),
            sum(size($"embedding")).cast("long").as("dims"),
            sum(floor(element_at($"embedding", 1).cast("double") * 1e6))
              .cast("long").as("e1"),
            sum(floor(element_at($"embedding", 8).cast("double") * 1e6))
              .cast("long").as("e8"))
          .orderBy("label")
      },
      Some("""
        SELECT CAST(label AS BIGINT) AS label,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(len(embedding)) AS BIGINT) AS dims,
               CAST(sum(floor(CAST(embedding[1] AS DOUBLE) * 1000000))
                 AS BIGINT) AS e1,
               CAST(sum(floor(CAST(embedding[8] AS DOUBLE) * 1000000))
                 AS BIGINT) AS e8
        FROM embeddings GROUP BY 1 ORDER BY 1""")),

    // ---- q182: the MULTIMODAL column shape rides the Avro
    // interchange under the hash — an opaque binary payload plus a
    // typed metadata STRUCT (nested one level) written as container
    // files and read back; the gate re-derives every aggregate
    // relationally from documents, so a value lost or reordered
    // anywhere in the struct/record mapping breaks the hash. ----
    Q("q182_avro_multimodal_meta",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q182-").toString
        t(s, dir, "documents")
          .select($"doc_id",
            encode($"text", "UTF-8").as("payload"),
            struct($"lang".as("lang"),
              $"n_chars".cast("long").as("n_chars"),
              struct($"source".as("source")).as("origin")).as("meta"))
          .write.format("graft-avro").mode("overwrite").save(s"$tmp/mm")
        s.read.format("graft-avro").load(s"$tmp/mm")
          .groupBy($"meta.lang".as("lang"))
          .agg(count(lit(1)).as("n"),
            sum($"meta.n_chars").cast("long").as("chars"),
            sum(length($"payload")).cast("long").as("bytes"),
            countDistinct($"meta.origin.source").as("sources"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(strlen(text)) AS BIGINT) AS bytes,
               CAST(count(DISTINCT source) AS BIGINT) AS sources
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- q183: the MAP and DECIMAL carriers ride the Avro
    // interchange under the hash (structs/arrays/binary already do via
    // q181/q182): a string-keyed map of longs plus an exact decimal
    // measure round-trip through graft-avro container files; every
    // aggregate is re-derived relationally by the oracle, so a value
    // lost/reordered in the map mapping or a scale slip in the decimal
    // unscaled-bytes encoding breaks the hash. The decimal sum is
    // compared as TEXT — exact, no float laundering. ----
    Q("q183_avro_map_decimal",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q183-").toString
        t(s, dir, "orders")
          .select($"o_orderkey".cast("long").as("k"),
            map(lit("ck"), $"o_custkey".cast("long"),
              lit("ok2"), ($"o_orderkey" * 2).cast("long")).as("props"),
            $"o_totalprice".cast("decimal(12,2)").as("price"))
          .write.format("graft-avro").mode("overwrite").save(s"$tmp/md")
        s.read.format("graft-avro").load(s"$tmp/md")
          .groupBy(($"k" % 5).cast("long").as("g"))
          .agg(count(lit(1)).as("n"),
            sum(element_at($"props", "ck")).cast("long").as("ck_sum"),
            max(element_at($"props", "ok2")).cast("long").as("ok2_max"),
            sum($"price").cast("string").as("price_sum"))
          .orderBy("g")
      },
      Some("""
        SELECT CAST(o_orderkey % 5 AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o_custkey) AS BIGINT) AS ck_sum,
               CAST(max(o_orderkey * 2) AS BIGINT) AS ok2_max,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                 AS price_sum
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- q184: Hive-style PARTITION-DIRECTORY columns on the Avro
    // landing, under the hash — BOTH sides of the layout: one
    // partitioned WRITE (partitionBy moves pr/b out of the payload
    // into pr=<priority>/b=<0|1> paths) and the partition-column READ
    // back. A partition predicate must prune whole directories at
    // PLAN time, before their contents are listed (require()d via the
    // prunedDirs counter — a pruning regression fails the query), and
    // the answer must still equal the relational oracle because
    // pruning is provable, never heuristic. ----
    Q("q184_avro_partition_dirs",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q184-").toString + "/land"
        val src = t(s, dir, "orders").select(
          $"o_orderkey".cast("long").as("k"),
          $"o_custkey".cast("long").as("ck"),
          $"o_totalprice".cast("double").as("price"),
          $"o_orderpriority".as("pr"),
          ($"o_orderkey" % 2).cast("long").as("b"))
        // ONE partitioned write builds the whole 5×2 layout (the
        // partition columns move out of the payload into the path);
        // clustering by the partition columns keeps each task's open-
        // writer count at ~1
        src.repartition($"pr", $"b")
          .write.format("graft-avro").option("partitionBy", "pr,b")
          .mode("append").save(tmp)
        val pruned0 = graft.sources.AvroSource.prunedDirs.get()
        val out = s.read.format("graft-avro").load(tmp)
          .where($"pr" === "1-URGENT" && $"b" === 1L)
          .groupBy(($"ck" % 7).cast("long").as("g"))
          .agg(count(lit(1)).as("n"),
            round(sum($"price"), 2).as("total"),
            max($"k").as("max_k"))
          .orderBy("g")
        require(out.rdd.partitions.length >= 1)
        require(graft.sources.AvroSource.prunedDirs.get() > pruned0,
          "q184: the non-matching partition directories must prune at " +
            "plan time, before listing")
        out
      },
      Some("""
        SELECT CAST(o_custkey % 7 AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(max(o_orderkey) AS BIGINT) AS max_k
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 1
        GROUP BY 1 ORDER BY 1""")),

    // ---- q185: the PARTITIONED landing under the streaming half of
    // the interchange, with ARCHIVAL, all under one hash: a
    // partitionBy write builds a pr=<priority> layout; the graft-avro
    // micro-batch read surfaces the path column, drains AvailableNow
    // in rate-limited batches, moves committed files into an archive
    // (the bounded-listing contract), and lands rows exactly-once in a
    // warehouse table whose aggregate must equal the relational
    // oracle — offsets, partition-path values, archival, and the
    // manifest commit all sit under the same hash. ----
    Q("q185_avro_partitioned_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import org.apache.spark.sql.types.{DoubleType, LongType,
          StringType, StructField, StructType}
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q185-").toString + "/land"
        t(s, dir, "orders").select(
            $"o_orderkey".cast("long").as("k"),
            $"o_totalprice".cast("double").as("price"),
            $"o_orderpriority".as("pr"))
          .repartition($"pr")
          .write.format("graft-avro").option("partitionBy", "pr")
          .mode("append").save(tmp)
        val whDir = graft.util.Scratch.dir("graft-q185wh-").toString
        val wh = new graft.pipeline.Warehouse(s, whDir,
          specs = Map("landed" -> graft.pipeline.Warehouse.TableSpec(
            StructType(Seq(
              StructField("k", LongType),
              StructField("pr", StringType),
              StructField("price", DoubleType))))))
        wh.bootstrap()
        val q = s.readStream.format("graft-avro")
          .schema("k long, price double, pr string")
          .option("maxFilesPerTrigger", 2)
          .option("archiveDir", s"$tmp-archive")
          .load(tmp)
          .select(col("k"), col("pr"), col("price"))
          .writeStream.format("graft-warehouse")
          .option("path", whDir).option("table", "landed")
          .option("checkpointLocation", s"$whDir/_ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        wh.read("landed")
          .groupBy($"pr")
          .agg(count(lit(1)).as("n"),
            round(sum($"price"), 2).as("total"),
            max($"k").as("max_k"))
          .orderBy("pr")
      },
      Some("""
        SELECT o_orderpriority AS pr, CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(max(o_orderkey) AS BIGINT) AS max_k
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- q186: the SELF-INDEXING landing under the hash — q180's
    // shape with the writeIndex pass DELETED: the two writes collect
    // their own column ranges inline and publish them at commit, so
    // the selective read must skip the out-of-range file (require()d
    // via the counter) off write-time stats alone, with the answer
    // still equal to the relational oracle. At 100 TB this is the
    // difference between a maintenance job that re-reads the corpus
    // and an index that is simply always there. ----
    Q("q186_avro_self_indexing",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.util.Scratch.dir("graft-q186-").toString + "/land"
        val src = t(s, dir, "orders").select(
          $"o_orderkey".cast("long").as("k"),
          $"o_custkey".cast("long").as("ck"),
          $"o_totalprice".cast("double").as("price"))
        src.where($"k" <= 1000).coalesce(1)
          .write.format("graft-avro").mode("append").save(tmp)
        src.where($"k" > 1000).coalesce(1)
          .write.format("graft-avro").mode("append").save(tmp)
        // NO writeIndex call — the writes indexed themselves
        val skips0 = graft.sources.AvroSource.skippedFiles.get()
        val out = s.read.format("graft-avro").load(tmp)
          .where($"k" > 1000)
          .groupBy(($"ck" % 11).cast("long").as("g"))
          .agg(count(lit(1)).as("n"),
            round(sum($"price"), 2).as("total"),
            min($"k").as("min_k"))
          .orderBy("g")
        require(out.rdd.partitions.length >= 1)
        require(graft.sources.AvroSource.skippedFiles.get() > skips0,
          "q186: the low-range file must skip off write-time stats " +
            "with no writeIndex pass")
        out
      },
      Some("""
        SELECT CAST(o_custkey % 11 AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(min(o_orderkey) AS BIGINT) AS min_k
        FROM orders WHERE o_orderkey > 1000
        GROUP BY 1 ORDER BY 1""")),

    // ---- q64: exact top-k per group through the custom bounded-heap
    // AGGREGATE (plans/TopKAgg, a TypedImperativeAggregate): each map
    // task forwards at most k values per group and partial heaps merge
    // associatively — the aggregate-shaped alternative to the q04
    // window form, usable in any groupBy/rollup/streaming agg. Values
    // only (no carrier columns), so ties are value-identical in both
    // engines and the posexploded rank is deterministic. ----
    Q("q64_topk_agg_prices",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(graft.plans.TopKAgg.topK($"o_totalprice", 5).as("top"))
          .select($"o_orderpriority", posexplode($"top"))
          .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rank"),
            $"col".as("price"))
          .orderBy("o_orderpriority", "rank")
      },
      Some("""
        SELECT o_orderpriority, rank, price FROM (
          SELECT o_orderpriority, o_totalprice AS price,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC) AS rank
          FROM orders)
        WHERE rank <= 5
        ORDER BY o_orderpriority, rank""")),

    // ---- q53: as-of enrichment through the NATIVE whole-operator plan
    // (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec — the full custom
    // ladder: logical node, planner strategy, physical streaming merge),
    // feeding a rollup: time-since-last-error distribution per event
    // type. Same contract as q15's composed form, but the plan is one
    // hash shuffle + sort PER SIDE and an O(1)-state merge — no
    // union-widened rows through a window operator. AsOfNativeSpec pins
    // native == composed on edge cases; this entry pins the semantics
    // against DuckDB's native ASOF JOIN. ----
    Q("q53_asof_native_gap_rollup",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val left = ev.where($"event_type" =!= "error")
        val errors = ev.where($"event_type" === "error")
          .select($"user_id", $"ts", $"value")
        AsOfJoin.native(left, errors, Seq("user_id"), "ts", Seq("ts", "value"), "err_")
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            count($"err_ts").as("n_after_error"),
            sum(unix_millis($"ts") - unix_millis($"err_ts")).as("gap_ms_total"),
            round(sum($"err_value"), 2).as("err_value_total"))
          .orderBy($"event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
          FROM events),
        err AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'error'),
        enriched AS (
          SELECT e.event_type, e.ts, r.ts AS err_ts, r.value AS err_value
          FROM (SELECT * FROM ev WHERE event_type <> 'error') e
          ASOF LEFT JOIN err r
            ON e.user_id = r.user_id AND e.ts >= r.ts)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(err_ts) AS BIGINT) AS n_after_error,
               CAST(sum(epoch_ms(ts) - epoch_ms(err_ts)) AS BIGINT) AS gap_ms_total,
               round(sum(err_value), 2) AS err_value_total
        FROM enriched
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- q70: KEYLESS RANGE JOIN — every non-error event falling in
    // the hour after ANY error, with no equi-key to hang a SortMerge on.
    // Spark's native plan for a pure range predicate is a nested-loop /
    // cartesian; operators/RangeJoin bins the time domain (1 bin ≈ the
    // window span) so it executes as a shuffled hash equi-join on bin
    // id + residual filter — linear rows through one shuffle, either
    // side arbitrarily large (RangeJoinSpec pins the no-nested-loop
    // plan). Per-window value sums are compared in exact milli units
    // (floor(value·1000) — identical IEEE double op both engines, then
    // integer summation, order-free). ----
    Q("q70_events_range_join",
      (s, dir) => {
        import graft.operators.RangeJoin
        val ev = t(s, dir, "events")
        val points = ev.where(col("event_type") =!= "error")
          .select(col("event_id").as("p_id"),
            unix_millis(col("ts")).as("pt"), col("value").as("p_value"))
        val wins = ev.where(col("event_type") === "error")
          .select(col("event_id").as("w_id"),
            unix_millis(col("ts")).as("lo"),
            (unix_millis(col("ts")) + 3600000L).as("hi"))
        RangeJoin.pointInInterval(points, "pt", wins, "lo", "hi",
            binWidth = 3600000L)
          .groupBy("w_id")
          .agg(count(lit(1)).as("n_points"),
            sum(floor(col("p_value") * 1000).cast("long")).as("value_milli"))
          .orderBy("w_id")
      },
      Some("""
        WITH p AS (
          SELECT event_id AS p_id, epoch_ms(ts) AS pt, value AS p_value
          FROM events WHERE event_type <> 'error'),
        w AS (
          SELECT event_id AS w_id, epoch_ms(ts) AS lo,
                 epoch_ms(ts) + 3600000 AS hi
          FROM events WHERE event_type = 'error')
        SELECT w_id, count(*) AS n_points,
               CAST(sum(CAST(floor(p_value * 1000) AS BIGINT)) AS BIGINT)
                 AS value_milli
        FROM w JOIN p ON p.pt BETWEEN w.lo AND w.hi
        GROUP BY w_id ORDER BY w_id""")),

    // ---- q77: explicit bloom-filter semi-join pruning. A ~1%-selective
    // order set (top price band) builds a distributed bloom filter; the
    // lineitem scan is pruned by the codegen'd `bloom_key_filter`
    // BEFORE its shuffle, then the exact join removes false positives —
    // result-identical to the plain join (the oracle IS the plain
    // join), which is precisely the operator's contract. At scale this
    // is the star-schema fact-scan kill: the fact side's exchange
    // carries only probable matches. ----
    Q("q77_bloom_pruned_join",
      (s, dir) => {
        import graft.operators.BloomPrune
        val hot = t(s, dir, "orders")
          .where(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_orderpriority"))
        BloomPrune.prunedJoin(
            t(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey",
            fpp = 0.01)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).cast("long").as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q80: EXACT heavy hitters via a Misra-Gries sketch + verify
    // pass. A skew key concentrates ~a third of events on 5 hot values
    // (~6.7% each) and thins the rest over ~10k cold ones; the sketch
    // pass folds k=200 counters per partition (never shuffling the full
    // key cardinality), the second pass counts only the ≤k candidates
    // exactly. MG guarantees no hot key can be missed (share 6.7% ≫
    // 1/(k+1)), so the answer is EXACT and the oracle brute-forces it
    // with a plain GROUP BY + HAVING. ----
    Q("q80_events_heavy_hitters",
      (s, dir) => {
        import graft.plans.HeavyHitters
        val ev = t(s, dir, "events").select(
          when(col("user_id") % 3 === 0, col("user_id") % 5)
            .otherwise(col("user_id") % 10000 + 100).as("skew_key"))
        HeavyHitters.exact(ev, col("skew_key"), minShare = 0.02)
          .select(col("key"), col("n_rows"),
            round(col("share"), 6).as("share"))
          .orderBy("key")
      },
      Some("""
        WITH e AS (
          SELECT CASE WHEN user_id % 3 = 0 THEN user_id % 5
                      ELSE user_id % 10000 + 100 END AS key
          FROM events),
        tot AS (SELECT count(*) * 1.0 AS n FROM e)
        SELECT key, CAST(count(*) AS BIGINT) AS n_rows,
               round(count(*) / (SELECT n FROM tot), 6) AS share
        FROM e GROUP BY key
        HAVING count(*) > 0.02 * (SELECT n FROM tot)
        ORDER BY key""")),

    // ---- q82: bloom-pruned ANTI join — the J1-J3 check-then-write
    // dedup shape with the mostly-new fast path: lineitems whose order
    // key the bloom rules out bypass the anti-join shuffle entirely;
    // only probable matches pay the exact probe. The oracle is the
    // plain NOT EXISTS — result identity for any fpp is the operator's
    // contract. ----
    Q("q82_bloom_pruned_antijoin",
      (s, dir) => {
        import graft.operators.BloomPrune
        val hot = t(s, dir, "orders")
          .where(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"))
        BloomPrune.prunedAntiJoin(
            t(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey",
            fpp = 0.01)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("long").as("n_items"),
            sum(col("l_quantity")).cast("long").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey
                            AND o.o_totalprice > 400000.0)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- q86: COHORT RETENTION — the product-analytics staple
    // (cohort = a user's first active week; retention = the share of
    // that cohort still active N weeks later). Weeks are integral
    // epoch-millis division, so bucket edges are engine-exact. Shape:
    // one (user, week) distinct, one per-user min, one join back
    // partitioned on user_id, one (cohort, offset) count; the per-cohort
    // base size joins back as a broadcast (≤ #cohorts rows). ----
    Q("q86_events_cohort_retention",
      (s, dir) => {
        val uw = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) DIV 604800000").as("week"))
          .distinct()
        val coh = uw.groupBy("user_id").agg(min(col("week")).as("cweek"))
        val act = uw.join(coh, "user_id")
          .groupBy(col("cweek"), (col("week") - col("cweek")).as("off"))
          .agg(count(lit(1)).as("n_active"))
        val c0 = act.where(col("off") === 0)
          .select(col("cweek"), col("n_active").as("n0"))
        act.join(broadcast(c0), "cweek")
          .select(col("cweek").as("cohort_week"),
            col("off").as("week_offset"),
            col("n_active").cast("long").as("n_active"),
            round(col("n_active").cast("double") / col("n0"), 4)
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""
        WITH uw AS (
          SELECT DISTINCT user_id,
                 epoch_ms(CAST(ts AS TIMESTAMP)) // 604800000 AS week
          FROM events),
        coh AS (SELECT user_id, min(week) AS cweek FROM uw GROUP BY user_id),
        act AS (
          SELECT c.cweek, u.week - c.cweek AS off, count(*) AS n_active
          FROM uw u JOIN coh c USING (user_id)
          GROUP BY 1, 2)
        SELECT a.cweek AS cohort_week, a.off AS week_offset,
               CAST(a.n_active AS BIGINT) AS n_active,
               round(CAST(a.n_active AS DOUBLE) / c0.n_active, 4) AS retention
        FROM act a JOIN act c0 ON a.cweek = c0.cweek AND c0.off = 0
        ORDER BY cohort_week, week_offset""")),

    // ---- q88: PageRank over the nation TRADE GRAPH (edges = customer
    // nation → supplier nation, weighted by lineitem count) — the
    // second iterative graph operator beside q54's connected
    // components, 5 fixed power iterations from a uniform start
    // (operators.PageRank: per round one normalized-weight join + one
    // dst aggregate; rank state never touches the driver). The oracle
    // UNROLLS the same 5 iterations as chained CTEs — identical
    // dataflow, so the 6-dp rounded fixpoint matches exactly. ----
    Q("q88_nation_trade_pagerank",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").select(col("c_custkey"),
            col("c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier").select(col("s_suppkey"),
            col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"),
            col("s_nationkey").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        val nodes = t(s, dir, "nation")
          .select(col("n_nationkey").as("node"))
        graft.operators.PageRank.run(edges, nodes, iters = 5)
          .select(col("node"), round(col("rank"), 6).as("pr_rank"))
          .orderBy("node")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""r$i AS (
          SELECT n.node, 0.15 / nt.nn + 0.85 * coalesce(c.cin, 0) AS pr
          FROM n CROSS JOIN nt
          LEFT JOIN (SELECT tr.dst, sum(r.pr * tr.p) AS cin
                     FROM tr JOIN r${i - 1} r ON r.node = tr.src
                     GROUP BY tr.dst) c ON c.dst = n.node)"""
        }.mkString(",\n        ")
        s"""
        WITH e AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 CAST(count(*) AS DOUBLE) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src),
        tr AS (SELECT e.src, e.dst, e.w / ow.wout AS p
               FROM e JOIN ow USING (src)),
        n AS (SELECT n_nationkey AS node FROM nation),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
        r0 AS (SELECT node, 1.0 / nt.nn AS pr FROM n CROSS JOIN nt),
        $iters
        SELECT node, round(pr, 6) AS pr_rank FROM r5 ORDER BY node"""
      }),

    // ---- q103: PageRank with DANGLING-MASS REDISTRIBUTION — the
    // exact-PageRank mode of the q88 operator on a graph where nations
    // 15..24 have NO out-edges (customer side restricted to < 15): each
    // round one extra scalar aggregate folds the leaked mass back as a
    // uniform teleport share, so ranks sum to 1. The oracle unrolls the
    // same 5 rounds with an explicit dangling-mass CTE per round. ----
    Q("q103_pagerank_dangling",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").select(col("c_custkey"),
            col("c_nationkey")).where(col("c_nationkey") < 15),
            col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier").select(col("s_suppkey"),
            col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"),
            col("s_nationkey").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        val nodes = t(s, dir, "nation")
          .select(col("n_nationkey").as("node"))
        graft.operators.PageRank.run(edges, nodes, iters = 5,
            redistributeDangling = true)
          .select(col("node"), round(col("rank"), 6).as("pr_rank"))
          .orderBy("node")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""r$i AS (
          SELECT n.node,
                 0.15 / nt.nn + 0.85 * (coalesce(c.cin, 0) + dm.m / nt.nn)
                   AS pr
          FROM n CROSS JOIN nt
          CROSS JOIN (SELECT coalesce(sum(r.pr), 0) AS m
                      FROM r${i - 1} r JOIN d USING (node)) dm
          LEFT JOIN (SELECT tr.dst, sum(r.pr * tr.p) AS cin
                     FROM tr JOIN r${i - 1} r ON r.node = tr.src
                     GROUP BY tr.dst) c ON c.dst = n.node)"""
        }.mkString(",\n        ")
        s"""
        WITH e AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 CAST(count(*) AS DOUBLE) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE c.c_nationkey < 15
          GROUP BY 1, 2),
        ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src),
        tr AS (SELECT e.src, e.dst, e.w / ow.wout AS p
               FROM e JOIN ow USING (src)),
        n AS (SELECT n_nationkey AS node FROM nation),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
        d AS (SELECT node FROM n
              WHERE node NOT IN (SELECT DISTINCT src FROM tr)),
        r0 AS (SELECT node, 1.0 / nt.nn AS pr FROM n CROSS JOIN nt),
        $iters
        SELECT node, round(pr, 6) AS pr_rank FROM r5 ORDER BY node"""
      }),

    // ---- q90: ordered FUNNEL completion (operators.Funnel) —
    // signup → view → purchase with strict first-touch ordering: each
    // step counts users whose earliest qualifying event falls strictly
    // after their completion of the previous step. One user-keyed
    // filtered aggregate per step over the shrinking survivor set; no
    // windows, no sequence collection. Millisecond event times keep
    // the strict inequality engine-exact. ----
    Q("q90_events_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_type"), unix_millis(col("ts")).as("ms"))
        graft.operators.Funnel.completion(ev, "user_id", "event_type",
            "ms", Seq("signup", "view", "purchase"))
          .orderBy("step")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
          FROM events),
        s1 AS (SELECT user_id, min(ms) AS t FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(ms) AS t
               FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND e.ms > s1.t
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(ms) AS t
               FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND e.ms > s2.t
               GROUP BY e.user_id)
        SELECT 1 AS step, 'signup' AS event_type,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        ORDER BY step""")),

    // ---- q94: trailing RANGE-interval window — 7-day rolling revenue
    // per order priority over the daily aggregate, expressed as a
    // value-range frame (RANGE BETWEEN 6 PRECEDING) on an integral day
    // index, NOT a row frame: days with no orders correctly shrink the
    // window (a rows-frame would silently span gaps). Integral
    // epoch-millis day buckets keep frame edges engine-exact; the
    // window is priority-partitioned (the repo-wide no-global-window
    // rule). ----
    Q("q94_rolling_revenue_7d",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            // o_orderdate reads as TIMESTAMP_NTZ; the cast pins it to
            // the session's UTC, matching the oracle's epoch_ms
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000")
              .as("day"))
          .agg(sum(col("o_totalprice")).as("rev"))
        val w = Window.partitionBy("pri").orderBy("day").rangeBetween(-6, 0)
        daily.select(col("pri"), col("day"),
            round(sum(col("rev")).over(w), 2).as("rev_7d"),
            count(lit(1)).over(w).cast("long").as("n_days_7d"))
          .orderBy("pri", "day")
      },
      Some("""
        WITH daily AS (
          SELECT o_orderpriority AS pri,
                 epoch_ms(o_orderdate) // 86400000 AS day,
                 sum(o_totalprice) AS rev
          FROM orders GROUP BY 1, 2)
        SELECT pri, day,
               round(sum(rev) OVER (PARTITION BY pri ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d,
               CAST(count(*) OVER (PARTITION BY pri ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_days_7d
        FROM daily
        ORDER BY pri, day""")),

    // ---- q98: NTILE decile segmentation — per-nation account-balance
    // deciles with per-decile stats. The tile assignment is made
    // engine-deterministic by a TOTAL order ((acctbal, custkey) is
    // unique), since ntile ties are resolved purely by row order;
    // nation-partitioned window per the repo rule. ----
    Q("q98_customer_balance_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
          .withColumn("decile", ntile(10).over(w))
          .groupBy("c_nationkey", "decile")
          .agg(count(lit(1)).cast("long").as("n_customers"),
            round(avg(col("c_acctbal")), 2).as("avg_bal"),
            round(max(col("c_acctbal")), 2).as("max_bal"))
          .select(col("c_nationkey"), col("decile").cast("long").as("decile"),
            col("n_customers"), col("avg_bal"), col("max_bal"))
          .orderBy("c_nationkey", "decile")
      },
      Some("""
        WITH tiled AS (
          SELECT c_nationkey, c_acctbal,
                 ntile(10) OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal, c_custkey) AS decile
          FROM customer)
        SELECT c_nationkey, CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(avg(c_acctbal), 2) AS avg_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM tiled
        GROUP BY c_nationkey, decile
        ORDER BY c_nationkey, decile""")),

    // ---- q99: event-sequence PATTERN MATCHING (MATCH_RECOGNIZE-lite):
    // each user's history collapses to an ordered initial-letter string
    // (total order (ts, event_id) — engine-stable), and a regex counts
    // view-burst purchases ('v+p'). Per-user state is that user's own
    // event count (bounded, groupBy-keyed — the CEP shape without a
    // sequence library); both engines run the same greedy
    // non-overlapping regex automaton. ----
    Q("q99_events_pattern_match",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch"))
        ev.groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("us"), col("event_id"),
              col("ch")))),
            x => x.getField("ch")), "").as("seq"))
          .select(col("user_id"),
            length(col("seq")).cast("long").as("seq_len"),
            regexp_count(col("seq"), lit("v+p")).cast("long").as("n_vp"))
          .orderBy("user_id")
      },
      Some("""
        WITH seqs AS (
          SELECT user_id,
                 string_agg(substring(event_type, 1, 1), ''
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                   AS seq
          FROM events GROUP BY user_id)
        SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
               CAST(length(regexp_extract_all(seq, 'v+p')) AS BIGINT)
                 AS n_vp
        FROM seqs ORDER BY user_id"""))  ,

    // ---- q112: TRIANGLE COUNTING (operators.Triangles) — the third
    // graph operator beside components (q54) and PageRank (q88), via
    // degree-ordered wedge closure: wedges form only between
    // OUT-neighbors under the (deg, id) orientation, so the hottest
    // vertex's wedge cost is bounded by O(sqrt |E|) out-degree, not
    // deg² — the published power-law fix (Σ outdeg² ≤ |E|^1.5). The
    // graph is a deterministic sparse pseudo-random graph over orders
    // arithmetic (both engines build it identically); the oracle
    // brute-forces the closed triple join under id order — same
    // triangle set, so per-node participation hash-matches while the
    // engine side exercises the oriented plan. ----
    Q("q112_orders_triangle_count",
      (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_orderkey") % 997).as("e_src"),
          // second endpoint through a coprime modulus so the pair
          // varies per key (mod 997 alone would collapse the graph to
          // out-degree 1 per residue — no triangles)
          ((col("o_orderkey") * 31 + 7) % 1009 % 997).as("e_dst"))
        graft.operators.Triangles.perNode(edges, "e_src", "e_dst")
          .orderBy("node")
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT
                 least(o_orderkey % 997,
                       (o_orderkey * 31 + 7) % 1009 % 997) AS u,
                 greatest(o_orderkey % 997,
                          (o_orderkey * 31 + 7) % 1009 % 997) AS v
          FROM orders
          WHERE o_orderkey % 997 <> (o_orderkey * 31 + 7) % 1009 % 997),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1
          JOIN e e2 ON e2.u = e1.v
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        nodes AS (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY node ORDER BY node"""))
  )
}

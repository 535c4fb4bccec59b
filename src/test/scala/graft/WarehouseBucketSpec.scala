package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** WAREHOUSE-NATIVE bucketed tables (`TableSpec.bucketBy/numBuckets`):
  * every write hash-places rows into `pmod(murmur3(key), n)` file
  * groups with the `_NNNNN` name stamp Spark's bucketed scan parses,
  * and reads report `HashPartitioning(key, n)` — so equi-joins and
  * aggregations on the bucket key run with ZERO shuffle exchanges.
  * The layout must survive every writer (append, compact, vectored
  * delete) and the `_meta` spec round-trip.
  */
class WarehouseBucketSpec extends SparkSpec {
  import spark.implicits._

  private val factSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))
  private val dimSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("name", StringType)))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-bwh-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = false,
      specs = Map(
        "f" -> Warehouse.TableSpec(factSchema,
          bucketBy = Seq("k"), numBuckets = 8),
        "d" -> Warehouse.TableSpec(dimSchema,
          bucketBy = Seq("k"), numBuckets = 8)))
    wh.bootstrap()
    (wh, dir)
  }

  private def factRows(n: Int, keys: Int): DataFrame =
    (1 to n).map(i => ((i % keys).toLong, i * 1.0)).toDF("k", "v")

  private def dimRows(keys: Int): DataFrame =
    (0 until keys).map(i => (i.toLong, s"n$i")).toDF("k", "name")

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize under AQE
    var n = 0
    df.queryExecution.executedPlan.foreachUp {
      case _: ShuffleExchangeExec => n += 1
      case p if p.getClass.getSimpleName == "AQEShuffleReadExec" => n += 1
      case _ => ()
    }
    n
  }

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("files carry the bucket stamp and rows sit in their hash bucket") {
    val (wh, _) = fresh()
    wh.append("f", factRows(1000, 100))
    assertStamps(wh)
    assert(wh.read("f").count() === 1000L)
  }

  /** Assert every row of `f` sits in a file whose `_NNNNN` stamp is the
    * row's true `pmod(murmur3(k), 8)` bucket — the invariant the
    * exchange elision TRUSTS; a mis-stamped file silently corrupts any
    * shuffle-free join or aggregate over it.
    */
  private def assertStamps(wh: Warehouse): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def expectedBucket(k: Long): Int = {
      val h = new Murmur3Hash(Seq(Literal(k))).eval(null).asInstanceOf[Int]
      ((h % 8) + 8) % 8
    }
    wh.read("f").select(col("k"), input_file_name().as("fn"))
      .collect().foreach { r =>
        val base = r.getString(1).split('/').last
        base match {
          case bucketRe(b) =>
            assert(b.toInt === expectedBucket(r.getLong(0)),
              s"row k=${r.getLong(0)} in wrong bucket file $base")
          case _ => fail(s"unstamped file in bucketed table: $base")
        }
      }
  }

  test("bucket-key join of two warehouse tables: zero exchanges") {
    val (wh, _) = fresh()
    wh.append("f", factRows(5000, 400))
    wh.append("d", dimRows(400))
    noBroadcast {
      val j = wh.read("f").join(wh.read("d"), "k")
        .groupBy("name").agg(sum("v").as("s"))
      assert(shuffles(wh.read("f").join(wh.read("d"), "k")) === 0)
      // the aggregate AFTER the join re-groups on a non-bucket column,
      // so one exchange for the agg is expected — but the join itself
      // contributes none
      val expected = factRows(5000, 400).join(dimRows(400), "k")
        .groupBy("name").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val (wh, _) = fresh()
    wh.append("f", factRows(2000, 64))
    noBroadcast {
      val agg = wh.read("f").groupBy("k").agg(sum("v").as("s"))
      assert(shuffles(agg) === 0)
      assert(agg.collect().length === 64)
    }
  }

  test("second append and compact preserve the layout and the results") {
    val (wh, _) = fresh()
    wh.append("f", factRows(3000, 200), rowsPerFile = 100)
    wh.append("f", factRows(3000, 200), rowsPerFile = 100)
    wh.append("d", dimRows(200))
    noBroadcast {
      assert(shuffles(wh.read("f").join(wh.read("d"), "k")) === 0)
    }
    val before = wh.read("f").groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (dirs, nBefore, nAfter) = wh.compact("f")
    assert(dirs > 0 && nAfter < nBefore)
    // the rewrite's files must re-stamp CORRECTLY — a compact that read
    // this table's own bucketed scan is exactly the shape where a
    // naive repartition gets elided and mis-stamps (see writeBatch)
    assertStamps(wh)
    val after = wh.read("f").groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after === before)
    noBroadcast {
      assert(shuffles(wh.read("f").join(wh.read("d"), "k")) === 0)
    }
  }

  test("spec round-trips through _meta: reopen keeps the bucket layout") {
    val (wh, dir) = fresh()
    wh.append("f", factRows(1000, 50))
    wh.append("d", dimRows(50))
    val re = Warehouse.open(spark, dir)
    noBroadcast {
      assert(shuffles(re.read("f").join(re.read("d"), "k")) === 0)
    }
    assert(re.read("f").count() === 1000L)
  }

  test("SQL: CREATE TABLE CLUSTERED BY round-trips and joins shuffle-free") {
    val dir = Files.createTempDirectory("graft-bwh-sql-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = false,
      specs = Map.empty)
    wh.registerSql("bkt_")
    spark.sql("CREATE TABLE bkt_f (k BIGINT, v DOUBLE) " +
      "CLUSTERED BY (k) INTO 8 BUCKETS")
    spark.sql("CREATE TABLE bkt_d (k BIGINT, name STRING) " +
      "CLUSTERED BY (k) INTO 8 BUCKETS STATS BY (k)")
    factRows(2000, 100).createOrReplaceTempView("bkt_src_f")
    dimRows(100).createOrReplaceTempView("bkt_src_d")
    spark.sql("INSERT INTO bkt_f SELECT * FROM bkt_src_f")
    spark.sql("INSERT INTO bkt_d SELECT * FROM bkt_src_d")
    noBroadcast {
      assert(shuffles(wh.read("f").join(wh.read("d"), "k")) === 0)
    }
    // SHOW CREATE TABLE emits the CLUSTERED BY clause and re-creates an
    // identical spec
    val ddl = spark.sql("SHOW CREATE TABLE bkt_d").head().getString(0)
    assert(ddl.contains("CLUSTERED BY (k) INTO 8 BUCKETS"), ddl)
    spark.sql(ddl.replace("bkt_d", "bkt_d2").split(";\n").head)
    assert(wh.tableSpec("d2") === wh.tableSpec("d"))
  }

  test("partitioned + bucketed compose: pruning and exchange-free joins") {
    val dir = Files.createTempDirectory("graft-bwh-pb-").toString
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("grp", StringType),
      StructField("v", DoubleType)))
    val wh = new Warehouse(spark, dir, retainReplaced = false,
      specs = Map(
        "f" -> Warehouse.TableSpec(schema, partitionBy = Seq("grp"),
          bucketBy = Seq("k"), numBuckets = 8),
        "d" -> Warehouse.TableSpec(dimSchema,
          bucketBy = Seq("k"), numBuckets = 8)))
    wh.bootstrap()
    wh.append("f", (1 to 4000)
      .map(i => ((i % 300).toLong, s"g${i % 4}", i * 1.0))
      .toDF("k", "grp", "v"))
    wh.append("d", dimRows(300))
    // partition pruning still applies on top of the bucket layout
    val pruned = wh.read("f").where(col("grp") === "g1")
    assert(pruned.count() === 1000L)
    noBroadcast {
      val j = wh.read("f").where(col("grp") === "g1")
        .join(wh.read("d"), "k")
      assert(shuffles(j) === 0)
      assert(j.count() === 1000L)
    }
  }

  test("vectored delete on a bucketed table stays correct") {
    val (wh, _) = fresh()
    wh.append("f", factRows(1000, 100))
    val n = wh.deleteVectored("f", col("k") < 10L)
    assert(n === 100L) // 10 keys x 10 rows each
    assert(wh.read("f").count() === 900L)
    assert(wh.read("f").where(col("k") < 10L).count() === 0L)
    // the layout still joins exchange-free after merge-on-read state
    wh.append("d", dimRows(100))
    noBroadcast {
      assert(shuffles(wh.read("f").join(wh.read("d"), "k")) === 0)
    }
  }
}

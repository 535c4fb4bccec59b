package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}

import graft.sources.AvroSource

/** The graft-avro DSv2 source (q175's carrier): writer-schema
  * inference, column pruning through Avro's own reader-schema
  * resolution, the T5 null-on-failure coercion contract with
  * null-vs-failed-parse distinguishable, and add-column schema
  * evolution.
  */
class AvroSourceSpec extends SparkSpec {

  import spark.implicits._

  private val writerSchema = new Schema.Parser().parse(
    """{"type":"record","name":"rec","fields":[
      |{"name":"k","type":"long"},
      |{"name":"name","type":"string"},
      |{"name":"price","type":["null","string"],"default":null},
      |{"name":"extra","type":"long"}]}""".stripMargin)

  /** Writes one container file of (k, name, price, extra) rows. */
  private def writeFile(dir: String, rows: Seq[(Long, String, String)]): Unit = {
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](writerSchema))
    w.create(writerSchema, new File(dir, s"part-${rows.hashCode}.avro"))
    try rows.foreach { case (k, n, p) =>
      val r = new GenericData.Record(writerSchema)
      r.put("k", k); r.put("name", n); r.put("price", p)
      r.put("extra", k * 10)
      w.append(r)
    } finally w.close()
  }

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrospec-")
      .toString
    writeFile(dir, Seq((1L, "a", "1.5"), (2L, "b", "oops"),
      (3L, "c", null)))
    writeFile(dir, Seq((4L, "d", "2.25")))
    dir
  }

  test("schema inference maps the writer schema (nullable-union unwrap " +
    "included) and a full read round-trips") {
    val dir = fixture()
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("k", "name", "price", "extra"))
    assert(df.schema("k").dataType.typeName === "long")
    assert(df.schema("price").dataType.typeName === "string")
    assert(df.orderBy("k").as[(Long, String, String, Long)].collect().toSeq
      === Seq((1L, "a", "1.5"), (2L, "b", "oops"), (3L, "c", null),
        (4L, "d", "2.25")).map { case (k, n, p) => (k, n, p, k * 10) })
  }

  test("PERMISSIVE coercion: string→double parses null-on-failure, the " +
    "raw writer text lands in _corrupt, and a genuine writer null stays " +
    "null WITHOUT a corrupt capture") {
    val dir = fixture()
    val got = spark.read.format("graft-avro")
      .schema("k long, price double, _corrupt string")
      .load(dir)
      .orderBy("k").as[(Long, Option[Double], Option[String])]
      .collect().toSeq
    assert(got === Seq(
      (1L, Some(1.5), None),
      (2L, None, Some("oops")), // failed parse: null + raw capture
      (3L, None, None), // genuine null: no capture
      (4L, Some(2.25), None)))
  }

  test("column pruning reaches Avro's schema resolution: a projection " +
    "opens PROJECTED readers (writer-only fields are decoder-skipped), " +
    "a full-width read does not") {
    val dir = fixture()
    val before = AvroSource.projectedReads.get()
    assert(spark.read.format("graft-avro").load(dir)
      .select($"name").as[String].collect().sorted.toSeq
      === Seq("a", "b", "c", "d"))
    assert(AvroSource.projectedReads.get() > before,
      "the one-column read must open projected readers")
    val before2 = AvroSource.projectedReads.get()
    spark.read.format("graft-avro").load(dir).collect()
    assert(AvroSource.projectedReads.get() === before2,
      "a full-width read must not project")
  }

  test("add-column schema evolution: a read schema field the writer " +
    "never had is all-null, everything else reads normally") {
    val dir = fixture()
    val got = spark.read.format("graft-avro")
      .schema("k long, added string")
      .load(dir).orderBy("k").as[(Long, Option[String])].collect().toSeq
    assert(got === Seq(1L, 2L, 3L, 4L).map(k => (k, None)))
  }

  test("custom corrupt-column name via columnNameOfCorruptRecord") {
    val dir = fixture()
    val got = spark.read.format("graft-avro")
      .option("columnNameOfCorruptRecord", "bad")
      .schema("k long, price double, bad string")
      .load(dir).where($"bad".isNotNull)
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    assert(got === Seq((2L, None, Some("oops"))))
  }

  test("WRITE path round-trips: nullable scalars, strings, binary, " +
    "timestamp (micros) and date through container files and back; " +
    "overwrite replaces") {
    import org.apache.spark.sql.functions.{col, lit, to_date, to_timestamp}
    val dir = java.nio.file.Files.createTempDirectory("graft-avrow-")
      .toString + "/out"
    val df = spark.range(0L, 100L).select(
      col("id").as("k"),
      org.apache.spark.sql.functions.concat(lit("s"), col("id")).as("s"),
      org.apache.spark.sql.functions.when(col("id") % 7 === 0, null)
        .otherwise(col("id") * 1.5).as("v"),
      to_timestamp(lit("2026-03-01 12:34:56.789")).as("ts"),
      to_date(lit("2026-03-01")).as("d"),
      org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.concat(lit("b"), col("id")),
        "UTF-8").as("bin"))
    df.repartition(3).write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("ts").dataType.typeName === "timestamp",
      "timestamp-micros logical type must round-trip the Spark type")
    assert(back.schema("d").dataType.typeName === "date")
    assert(back.count() === 100L)
    import org.apache.spark.sql.functions.{countDistinct, max, min, sum}
    val r = back.agg(sum($"k"), countDistinct($"s"),
      sum($"v"), min($"ts").cast("string"), max($"d").cast("string"),
      countDistinct($"bin")).head()
    assert(r.getLong(0) === 4950L)
    assert(r.getLong(1) === 100L)
    assert(r.getDouble(2) ===
      (0L until 100L).filter(_ % 7 != 0).map(_ * 1.5).sum)
    assert(r.getString(3) === "2026-03-01 12:34:56.789")
    assert(r.getString(4) === "2026-03-01")
    assert(r.getLong(5) === 100L)
    // overwrite replaces the previous files entirely
    spark.range(0L, 5L).select(col("id").as("k"), lit("x").as("s"),
        lit(1.0).as("v"), to_timestamp(lit("2026-01-01")).as("ts"),
        to_date(lit("2026-01-01")).as("d"), lit(Array[Byte](1)).as("bin"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 5L)
  }

  test("STREAMING read: landed container files arrive exactly once " +
    "across AvailableNow restarts (file-set offset), late-sorting " +
    "names included") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avrostr-")
      .toString
    val ckp = java.nio.file.Files
      .createTempDirectory("graft-avrostr-ckp-").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-avrostr-out-").toString
    writeFile(dir, Seq((1L, "a", "1.0"), (2L, "b", "2.0")))
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-avro")
        .schema("k long, name string, price double")
        .load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).select($"k").as[Long]
      .collect().toSet === Set(1L, 2L))
    // a second wave lands (its generated name may sort anywhere);
    // a restart from the same checkpoint emits exactly the new file
    writeFile(dir, Seq((3L, "c", "3.0")))
    runOnce()
    assert(spark.read.parquet(out).select($"k").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("sync-marker SPLIT: a multi-block container file read as N " +
    "byte-range partitions equals the single-partition read " +
    "row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrosplit-")
      .toString
    // many small blocks: the minimum sync interval forces a block per
    // few records, giving the byte ranges real boundaries to land on
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](writerSchema))
    w.setSyncInterval(32)
    w.create(writerSchema, new File(dir, "big.avro"))
    try (0L until 500L).foreach { k =>
      val r = new GenericData.Record(writerSchema)
      r.put("k", k); r.put("name", s"name-$k"); r.put("price", s"$k.5")
      r.put("extra", k * 10)
      w.append(r)
    } finally w.close()
    val whole = spark.read.format("graft-avro").load(dir)
    assert(whole.rdd.getNumPartitions === 1, "below the default split " +
      "size the file must stay one whole-file partition")
    val wholeRows = whole.orderBy("k")
      .as[(Long, String, String, Long)].collect().toSeq
    val split = spark.read.format("graft-avro")
      .option("splitSize", 1024).load(dir)
    assert(split.rdd.getNumPartitions > 1,
      "splitSize below the file length must plan multiple byte ranges")
    assert(split.orderBy("k").as[(Long, String, String, Long)]
      .collect().toSeq === wholeRows)
    assert(wholeRows.length === 500)
  }

  test("filter pushdown + stats sidecar: a selective predicate SKIPS " +
    "indexed files that provably can't match; files landed after the " +
    "index write always scan (stale index loses nothing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avroidx-")
      .toString
    writeFile(dir, (0L until 50L).map(k => (k, s"lo-$k", s"$k.0")))
    writeFile(dir, (1000L until 1050L).map(k => (k, s"hi-$k", s"$k.0")))
    AvroSource.writeIndex(spark, dir)
    // the counter asserts per-planning PARITY, not absolute counts —
    // DSv2 may plan a scan's partitions more than once per query
    val before = AvroSource.skippedFiles.get()
    val got = spark.read.format("graft-avro").load(dir)
      .where($"k" >= 1000L).select($"k").as[Long].collect().toSeq.sorted
    assert(got === (1000L until 1050L))
    assert(AvroSource.skippedFiles.get() > before,
      "the lo-range file must be skipped at plan time")
    // string-range skip on a different column
    val b2 = AvroSource.skippedFiles.get()
    assert(spark.read.format("graft-avro").load(dir)
      .where($"name".startsWith("lo-")).count() === 50L)
    assert(AvroSource.skippedFiles.get() > b2,
      "the hi-names file must be skipped for the prefix filter")
    // stale index: a file landed AFTER the index write is absent from
    // it and must always scan — only the two indexed files ever skip
    // (delta stays even), and the late row is found
    writeFile(dir, Seq((5000L, "late", "1.0")))
    val b3 = AvroSource.skippedFiles.get()
    assert(spark.read.format("graft-avro").load(dir)
      .where($"k" === 5000L).count() === 1L)
    val d3 = AvroSource.skippedFiles.get() - b3
    assert(d3 > 0 && d3 % 2 === 0,
      "both indexed files skip per planning; the unindexed late file scans")
  }

  test("overwrite commit order: new files rename IN before old files " +
    "delete — the crash window between the phases reads old ∪ new, " +
    "never a gutted directory") {
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    import graft.sources.{AvroBatchWrite, AvroTaskCommit, TleSource}
    val dir = java.nio.file.Files.createTempDirectory("graft-avroow-")
      .toString
    writeFile(dir, Seq((1L, "old1", "1.0"), (2L, "old2", "2.0")))
    val preexisting = TleSource.listDataFiles(dir)
    assert(preexisting.nonEmpty)
    // completed-task state: the new generation sits in dot-temps
    // (invisible to the data listing), exactly what commit() sees
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](writerSchema))
    w.create(writerSchema, new File(dir, ".part-00000-7.avro"))
    try Seq(10L, 11L).foreach { k =>
      val r = new GenericData.Record(writerSchema)
      r.put("k", k); r.put("name", s"new-$k"); r.put("price", null)
      r.put("extra", 0L)
      w.append(r)
    } finally w.close()
    val bw = new AvroBatchWrite(dir, spark.read.format("graft-avro")
      .load(dir).schema, true, TleSource.sessionConfProps())
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    val published = bw.renameIn(fs,
      Array[WriterCommitMessage](AvroTaskCommit.one(".part-00000-7.avro")))
    // CRASH WINDOW: phase 1 done, phase 2 not — the directory must
    // read as a recoverable superset (old ∪ new), not empty/partial
    val mid = spark.read.format("graft-avro").load(dir)
      .select($"k").as[Long].collect().toSet
    assert(mid === Set(1L, 2L, 10L, 11L),
      "between the commit phases old AND new data must both be intact")
    bw.deleteReplaced(fs, preexisting, published)
    assert(spark.read.format("graft-avro").load(dir)
      .select($"k").as[Long].collect().toSet === Set(10L, 11L))
  }

  test("Trigger.AvailableNow is FIRST-CLASS with maxFilesPerTrigger " +
    "admission: a 10-file landing drains in 3-file micro-batches and " +
    "terminates at the prepare-time listing, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avroadm-")
      .toString
    val ckp = java.nio.file.Files
      .createTempDirectory("graft-avroadm-ckp-").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-avroadm-out-").toString
    (0 until 10).foreach(i => writeFile(dir,
      Seq((i.toLong, s"n$i", s"$i.0"))))
    val q = spark.readStream.format("graft-avro")
      .schema("k long, name string, price double")
      .option("maxFilesPerTrigger", 3)
      .load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).select($"k").as[Long]
      .collect().toSet === (0L until 10L).toSet)
    // 10 files at 3 per trigger = 4 committed micro-batches — the
    // witness that admission control actually batched the drain (the
    // pre-r14 fallback ran ONE giant batch and warned)
    val commits = java.nio.file.Files.list(
        java.nio.file.Paths.get(ckp, "commits")).toArray
      .map(_.toString).count(p => !p.endsWith(".crc"))
    assert(commits === 4,
      s"expected 4 rate-limited micro-batches, saw $commits")
    // a restart sees nothing new and terminates without a batch
    val q2 = spark.readStream.format("graft-avro")
      .schema("k long, name string, price double")
      .option("maxFilesPerTrigger", 3)
      .load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() === 10L)
  }

  test("DECIMAL and ARRAY columns round-trip: decimal logical type " +
    "(unscaled big-endian bytes), array<float> embeddings, nullable " +
    "array elements; read-side rescale is exact and overflow nulls " +
    "with a corrupt capture") {
    import org.apache.spark.sql.functions.{array, col, lit, when}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val dir = java.nio.file.Files.createTempDirectory("graft-avrodec-")
      .toString + "/out"
    val df = spark.range(0L, 50L).select(
      col("id").as("k"),
      (col("id") * 100 + lit(0.25)).cast("decimal(12,2)").as("dec"),
      array(col("id").cast("float"), (col("id") * 2).cast("float"),
        lit(0.5f)).as("emb"),
      when(col("id") % 5 === 0, lit(null))
        .otherwise(array(col("id"), col("id") + 1,
          lit(null).cast("long"))).as("nums"))
    df.write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("dec").dataType.sql === "DECIMAL(12,2)")
    assert(back.schema("emb").dataType ===
      ArrayType(FloatType, containsNull = true))
    val got = back.orderBy("k")
      .as[(Long, BigDecimal, Seq[Float], Option[Seq[Option[Long]]])]
      .collect().toSeq
    assert(got === (0L until 50L).map { i =>
      (i, BigDecimal(i * 100) + BigDecimal("0.25"),
        Seq(i.toFloat, (i * 2).toFloat, 0.5f),
        if (i % 5 == 0) None else Some(Seq(Some(i), Some(i + 1), None)))
    })
    // exact rescale on read: decimal(14,4) widens losslessly
    val wide = spark.read.format("graft-avro")
      .schema("k long, dec decimal(14,4)").load(dir)
      .orderBy("k").as[(Long, BigDecimal)].collect()
    assert(wide(3)._2 === BigDecimal("300.2500"))
    // overflow: decimal(4,2) can't hold 4900.25 → null + raw capture
    val tight = spark.read.format("graft-avro")
      .schema("k long, dec decimal(4,2), _corrupt string").load(dir)
      .where($"k" === 49L)
      .as[(Long, Option[BigDecimal], Option[String])].collect().head
    assert(tight._2.isEmpty && tight._3 === Some("4900.25"))
  }

  test("STRUCT columns round-trip as nested Avro records (the " +
    "multimodal blob + typed-metadata shape), including struct-in-" +
    "array and struct-level add-column evolution") {
    import org.apache.spark.sql.functions.{array, col, lit, struct, when}
    val dir = java.nio.file.Files.createTempDirectory("graft-avrost-")
      .toString + "/out"
    val df = spark.range(0L, 30L).select(
      col("id").as("k"),
      org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.concat(lit("blob"), col("id")),
        "UTF-8").as("payload"),
      when(col("id") % 7 === 0, lit(null)).otherwise(struct(
        lit("image/png").as("mime"),
        (col("id") * 10).cast("int").as("width"),
        struct(col("id").as("ts_id"), lit("cam-1").as("device"))
          .as("origin"))).as("meta"),
      array(struct(col("id").as("s"), (col("id") * 2).as("e"))).as("spans"))
    df.write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("meta").dataType.sql ===
      "STRUCT<mime: STRING, width: INT, origin: STRUCT<ts_id: BIGINT, device: STRING>>")
    val got = back.selectExpr("k", "meta.mime", "meta.width",
        "meta.origin.device", "spans[0].e").orderBy("k")
      .as[(Long, Option[String], Option[Int], Option[String], Long)]
      .collect().toSeq
    assert(got === (0L until 30L).map { i =>
      if (i % 7 == 0) (i, None, None, None, i * 2)
      else (i, Some("image/png"), Some(i.toInt * 10), Some("cam-1"), i * 2)
    })
    // struct-level evolution: a read asking for a subfield the writer
    // never had gets null there, known subfields still read
    val evolved = spark.read.format("graft-avro")
      .schema("k long, meta struct<mime string, dpi int>")
      .load(dir).where($"k" === 1L)
      .selectExpr("meta.mime", "meta.dpi")
      .as[(String, Option[Int])].collect().head
    assert(evolved === (("image/png", None)))
  }

  test("MAP columns round-trip as Avro maps (string keys), nullable " +
    "values and map-of-array included") {
    import org.apache.spark.sql.functions.{array, col, lit, map, when}
    val dir = java.nio.file.Files.createTempDirectory("graft-avromap-")
      .toString + "/out"
    spark.range(0L, 20L).select(
        col("id").as("k"),
        map(lit("a"), col("id") * 2,
          lit("b"), when(col("id") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("id"))).as("m"),
        map(lit("emb"), array(col("id").cast("float"), lit(1.5f)))
          .as("vecs"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("m").dataType.sql === "MAP<STRING, BIGINT>")
    val got = back.selectExpr("k", "m['a']", "m['b']",
        "vecs['emb'][1]").orderBy("k")
      .as[(Long, Long, Option[Long], Float)].collect().toSeq
    assert(got === (0L until 20L).map(i =>
      (i, i * 2, if (i % 3 == 0) None else Some(i), 1.5f)))
  }

  test("int/long/float/double widenings coerce exactly; long→int " +
    "overflow nulls instead of wrapping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrospec-")
      .toString
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"r2","fields":[
        |{"name":"i","type":"int"},{"name":"l","type":"long"},
        |{"name":"f","type":"float"}]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
    w.create(s, new File(dir, "one.avro"))
    val r1 = new GenericData.Record(s)
    r1.put("i", 7); r1.put("l", 5L); r1.put("f", 1.25f)
    val r2 = new GenericData.Record(s)
    r2.put("i", 8); r2.put("l", Long.MaxValue); r2.put("f", 2.5f)
    w.append(r1); w.append(r2); w.close()
    val got = spark.read.format("graft-avro")
      .schema("i long, l int, f double")
      .load(dir).orderBy("i")
      .as[(Long, Option[Int], Double)].collect().toSeq
    assert(got === Seq((7L, Some(5), 1.25), (8L, None, 2.5)))
  }

  test("NaN never poisons the stats sidecar: a file holding a NaN is " +
    "NEVER stats-skipped (Spark orders NaN above every double, so it " +
    "can pass any comparison), while a NaN-free out-of-range file " +
    "still skips") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-avronan-")
      .toString + "/land"
    // file A: small doubles plus one NaN; file B: mid-range, NaN-free
    Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN)).toDF("k", "v")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    Seq((10L, 5.0), (11L, 6.0)).toDF("k", "v")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    AvroSource.writeIndex(spark, dir)
    // v > 100 matches ONLY the NaN row — under the pre-fix index both
    // files' bounds would reject it and the row would silently vanish
    val before = AvroSource.skippedFiles.get()
    val got = spark.read.format("graft-avro").load(dir)
      .where(col("v") > 100.0).select($"k").as[Long].collect().toSeq
    assert(got === Seq(3L),
      "the NaN row must survive a stats-indexed selective scan")
    assert(AvroSource.skippedFiles.get() > before,
      "the NaN-free mid-range file must still skip")
    // the NaN file's non-NaN bounds stay useful: v <= 2 keeps file A,
    // skips file B
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("v") <= 2.0).count() === 2L)
  }

  test("data file names carry a per-write-job id (unique across " +
    "applications), and an overwrite commit invalidates the sidecar " +
    "index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrojob-")
      .toString + "/land"
    Seq((1L, "a")).toDF("k", "s")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    Seq((2L, "b")).toDF("k", "s")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val names = graft.util.FsListing.dataFiles(dir).map(_._1)
    val pat = "part-\\d{5}-\\d+-[0-9a-f]{8}\\.avro".r
    assert(names.forall(n => pat.matches(n)),
      s"file names must embed partition-task-job: $names")
    val jobIds = names.map(_.split("-").last.stripSuffix(".avro")).toSet
    assert(jobIds.size === 2,
      "two write jobs must stamp two distinct job ids")
    AvroSource.writeIndex(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_index.json")))
    Seq((3L, "c")).toDF("k", "s")
      .write.format("graft-avro").mode("overwrite").save(dir)
    // overwrite invalidates the old index, and the self-indexing
    // commit rebuilds a fresh one holding ONLY the new generation
    assert(AvroSource.readIndex(dir).keySet ===
      graft.util.FsListing.dataFiles(dir).map(_._1).toSet,
      "the post-overwrite index must describe exactly the new files")
    assert(spark.read.format("graft-avro").load(dir)
      .select($"k").as[Long].collect().toSeq === Seq(3L))
  }

  test("SELF-INDEXING writes: the commit publishes inline-collected " +
    "column stats, so a selective read skips files with NO writeIndex " +
    "pass at all; NaN safety carries over; statsIndex=false opts out") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-avrosi-")
      .toString + "/land"
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    Seq((1000L, 5.0), (1001L, Double.NaN)).toDF("k", "v")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    // no writeIndex call anywhere — the writes indexed themselves
    assert(AvroSource.readIndex(dir).size === 2)
    val before = AvroSource.skippedFiles.get()
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("k") <= 2L).count() === 2L)
    assert(AvroSource.skippedFiles.get() > before,
      "the high-range file must skip off write-time stats")
    // the inline pass excluded NaN from the bounds but flagged it:
    // v > 100 must still find the NaN row (file 2 scans, not skips)
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("v") > 100.0).select($"k").as[Long].collect().toSeq
      === Seq(1001L))
    // write-time stats equal a read-back statsOf pass exactly
    val inline = AvroSource.readIndex(dir)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-avrosi2-").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    graft.util.FsListing.dataFiles(dir).foreach { case (rel, _) =>
      fs.copyToLocalFile(new org.apache.hadoop.fs.Path(s"$dir/$rel"),
        new org.apache.hadoop.fs.Path(s"$rebuilt/$rel"))
    }
    AvroSource.writeIndex(spark, rebuilt)
    assert(AvroSource.readIndex(rebuilt) === inline,
      "inline write-time stats must equal the read-back pass")
    // opt-out: no index artifacts at all
    val plain = java.nio.file.Files.createTempDirectory("graft-avrosi3-")
      .toString + "/land"
    Seq((1L, 1.0)).toDF("k", "v")
      .write.format("graft-avro").option("statsIndex", "false")
      .mode("append").save(plain)
    assert(AvroSource.readIndex(plain).isEmpty)
    // partitioned self-indexing: entries keyed by the k=v rel path
    val pd = java.nio.file.Files.createTempDirectory("graft-avrosi4-")
      .toString + "/land"
    Seq((1L, "a"), (1000L, "b")).toDF("k", "g")
      .repartition(col("g"))
      .write.format("graft-avro").option("partitionBy", "g")
      .mode("append").save(pd)
    val keys = AvroSource.readIndex(pd).keySet
    assert(keys.size === 2 && keys.forall(_.startsWith("g=")), keys)
  }

  test("nested record names stay unique after sanitization: sibling " +
    "struct paths that collide when joined with '_' (a.b_c vs a_b.c) " +
    "write and round-trip instead of failing on a duplicate Avro name") {
    import org.apache.spark.sql.functions.{col, struct}
    val dir = java.nio.file.Files.createTempDirectory("graft-avrorec-")
      .toString + "/out"
    // paths a→b_c and a_b→c both sanitize to "a_b_c" — the pre-fix
    // name derivation produced duplicate record names here
    Seq((1L, 10L, 20L)).toDF("k", "x", "y")
      .select($"k",
        struct(struct($"x".as("v")).as("b_c")).as("a"),
        struct(struct($"y".as("v")).as("c")).as("a_b"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    val got = spark.read.format("graft-avro").load(dir)
      .selectExpr("k", "a.b_c.v", "a_b.c.v")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 20L)))
  }

  test("block compression: zstd is the write default (stamped in the " +
    "container's own metadata), every accepted codec round-trips, " +
    "compressed files are smaller than null-codec, and byte-range " +
    "splits work on compressed multi-block files") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.GenericDatumReader
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("graft-avrocodec-")
      .toString
    // repetitive payload so compression has something to bite on
    val df = spark.range(0, 3000)
      .select($"id".as("k"),
        lit("the quick brown fox jumps over the lazy dog ").as("s"))
    def bytes(dir: String): Long =
      graft.util.FsListing.dataFiles(dir).map(_._2).sum
    // default: no option → zstd, readable, stamped in file metadata
    df.coalesce(1).write.format("graft-avro").mode("overwrite")
      .save(s"$base/default")
    val f0 = graft.util.FsListing.dataFiles(s"$base/default").head._1
    val rdr = new DataFileReader(
      new File(s"$base/default/$f0"),
      new GenericDatumReader[GenericRecord]())
    try assert(rdr.getMetaString("avro.codec") === "zstandard")
    finally rdr.close()
    val sizes = Seq("null", "zstd", "snappy", "deflate", "xz").map { c =>
      val dir = s"$base/$c"
      df.coalesce(1).write.format("graft-avro").option("codec", c)
        .mode("overwrite").save(dir)
      assert(spark.read.format("graft-avro").load(dir).count() === 3000L,
        s"codec $c must round-trip")
      c -> bytes(dir)
    }.toMap
    Seq("zstd", "snappy", "deflate", "xz").foreach { c =>
      assert(sizes(c) < sizes("null"),
        s"codec $c must beat null-codec on a repetitive payload " +
          s"(${sizes(c)} vs ${sizes("null")})")
    }
    info(s"codec sizes on 3000 repetitive rows: $sizes")
    // sync markers sit outside compressed block payloads: a compressed
    // multi-block file byte-range splits exactly like an uncompressed
    // one (small splitSize forces >1 partition; rows match the whole
    // read)
    val split = spark.read.format("graft-avro")
      .option("splitSize", 2048).load(s"$base/zstd")
    assert(split.rdd.getNumPartitions > 1,
      "the compressed container must split into byte ranges")
    assert(split.select($"k").as[Long].collect().sorted.toSeq
      === (0L until 3000L))
    // a bad codec name fails at plan time with the accepted list
    val e = intercept[IllegalArgumentException] {
      df.write.format("graft-avro").option("codec", "lzo")
        .mode("overwrite").save(s"$base/bad")
    }
    assert(e.getMessage.contains("unknown codec"))
  }

  test("STREAMING byte-range split: one huge landed container fans " +
    "out across >1 partition WITHIN its micro-batch, rows exactly " +
    "once, and a restart sees nothing new") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avrossp-")
      .toString
    val ckp = java.nio.file.Files
      .createTempDirectory("graft-avrossp-ckp-").toString
    // one multi-block container (sync interval forces many blocks)
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](writerSchema))
    w.setSyncInterval(32)
    w.create(writerSchema, new File(dir, "big.avro"))
    try (0L until 500L).foreach { k =>
      val r = new GenericData.Record(writerSchema)
      r.put("k", k); r.put("name", s"name-$k"); r.put("price", s"$k.5")
      r.put("extra", k * 10)
      w.append(r)
    } finally w.close()
    val seenParts = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-avro")
        .schema("k long, name string")
        .option("splitSize", 1024)
        .load(dir)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            seenParts.updateAndGet(m => math.max(m, df.rdd.getNumPartitions))
            df.select($"k").as[Long].collect().foreach(got.add)
            ()
        }
        .trigger(Trigger.AvailableNow()).option("checkpointLocation", ckp)
        .start()
      q.awaitTermination()
    }
    drain()
    assert(seenParts.get() > 1,
      "the landed container must byte-range split inside its micro-batch")
    assert(got.size === 500, "rows must arrive exactly once")
    assert(got.iterator().asScala.toSeq.sorted === (0L until 500L))
    drain() // restart: offset already covers the file — nothing new
    assert(got.size === 500, "a restart must not re-deliver any range")
  }

  test("partition-directory columns: k=v path segments surface as " +
    "typed columns, a partition predicate prunes whole directories " +
    "BEFORE listing them, numeric partitions compare numerically, and " +
    "the Hive null sentinel reads as null") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-avropart-")
      .toString
    def land(rel: String, rows: Seq[(Long, String, String)]): Unit = {
      new File(s"$dir/$rel").mkdirs()
      writeFile(s"$dir/$rel", rows)
    }
    land("dt=2026-01-01/lang=en", Seq((1L, "a", "1.0"), (2L, "b", "2.0")))
    land("dt=2026-01-01/lang=fr", Seq((3L, "c", "3.0")))
    land("dt=2026-01-02/lang=en", Seq((4L, "d", "4.0")))
    land("dt=2026-01-02/lang=__HIVE_DEFAULT_PARTITION__",
      Seq((5L, "e", "5.0")))
    val df = spark.read.format("graft-avro").load(dir)
    // inferred: data fields + dt (date, first value parses ISO) + lang
    assert(df.schema("dt").dataType.typeName === "date")
    assert(df.schema("lang").dataType.typeName === "string")
    assert(df.select($"k", $"dt".cast("string"), $"lang")
      .as[(Long, String, Option[String])].collect().sorted.toSeq === Seq(
        (1L, "2026-01-01", Some("en")), (2L, "2026-01-01", Some("en")),
        (3L, "2026-01-01", Some("fr")), (4L, "2026-01-02", Some("en")),
        (5L, "2026-01-02", None)))
    // a dt predicate prunes the other dt directory BEFORE listing:
    // its lang children are never visited
    val p0 = AvroSource.prunedDirs.get()
    val jan1 = df.where(col("dt") === java.sql.Date.valueOf("2026-01-01"))
    assert(jan1.select($"k").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L))
    assert(AvroSource.prunedDirs.get() > p0,
      "the dt=2026-01-02 directory must prune at plan time")
    // a second-level lang predicate prunes within surviving dt dirs,
    // and the null-sentinel dir can't pass a comparison either
    val p1 = AvroSource.prunedDirs.get()
    assert(df.where(col("lang") === "en").select($"k").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 4L))
    assert(AvroSource.prunedDirs.get() - p1 >= 2,
      "lang=fr and the null-sentinel dir must both prune")
    // IsNull keeps the sentinel dir (conservative fall-through)
    assert(df.where(col("lang").isNull).select($"k").as[Long]
      .collect().toSeq === Seq(5L))
    // numeric partitions prune NUMERICALLY: bucket=10 >= 9 must keep
    // 10 (a string compare would wrongly prune "10" < "9")
    val nd = java.nio.file.Files.createTempDirectory("graft-avropnum-")
      .toString
    Seq("bucket=9", "bucket=10").zipWithIndex.foreach { case (b, i) =>
      new File(s"$nd/$b").mkdirs()
      writeFile(s"$nd/$b", Seq((i.toLong, s"r$i", "0.0")))
    }
    val num = spark.read.format("graft-avro").load(nd)
    assert(num.schema("bucket").dataType.typeName === "long")
    assert(num.where(col("bucket") >= 10L).select($"bucket").as[Long]
      .collect().toSeq === Seq(10L),
      "numeric partition pruning must compare in the numeric domain")
    // an explicit read schema overrides the partition column type
    val asStr = spark.read.format("graft-avro")
      .schema("k long, dt string, lang string").load(dir)
    assert(asStr.where($"dt" === "2026-01-02").count() === 2L)
  }

  test("scan statistics and RUNTIME (join-driven) filtering: a " +
    "selective scan reports post-pruning sizeInBytes so Catalyst can " +
    "broadcast it, and a runtime In-filter injected by a join prunes " +
    "partition directories like a plan-time predicate") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    import org.apache.spark.sql.sources.In
    import graft.sources.AvroScan
    val dir = java.nio.file.Files.createTempDirectory("graft-avrostat-")
      .toString + "/land"
    (0 until 4).foreach { g =>
      Seq.tabulate(200)(i => (g * 1000L + i, s"g$g", g.toLong))
        .toDF("k", "s", "g")
        .coalesce(1).write.format("graft-avro")
        .option("partitionBy", "g").mode("append").save(dir)
    }
    graft.sources.AvroSource.writeIndex(spark, dir)
    // post-pruning statistics: the selective read reports far fewer
    // bytes than the full read (3 of 4 directories pruned)
    val full = spark.read.format("graft-avro").load(dir)
    val sel = full.where(col("g") === 2L)
    def scanStats(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.get
    val (fullB, selB) = (scanStats(full), scanStats(sel))
    assert(selB < fullB / 2,
      s"selective scan must report post-pruning bytes ($selB vs $fullB)")
    // runtime filtering hook: an injected In-filter (what DPP executes
    // a small join side to produce) prunes directories at re-planning
    val scan = sel.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.get.asInstanceOf[AvroScan]
    assert(scan.filterAttributes().map(_.describe()).contains("g"))
    val fullScan = full.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.get.asInstanceOf[AvroScan]
    val p0 = AvroSource.prunedDirs.get()
    fullScan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("g", Array(1L, 3L))))
    val parts = fullScan.planInputPartitions()
    assert(AvroSource.prunedDirs.get() - p0 >= 2,
      "the runtime In-filter must prune the g=0 and g=2 directories")
    assert(parts.length === 2, "only the two matching files plan")
    // end-to-end: a broadcast join against the filtered dim still
    // returns exactly the matching rows (runtime pruning is an I/O
    // cut; Spark re-applies the join)
    val dim = Seq((2L, "keep")).toDF("g", "tag")
    val joined = full.join(org.apache.spark.sql.functions.broadcast(dim),
      "g")
    assert(joined.count() === 200L)
  }

  test("pushed LIMIT truncates per partition: limit 5 over a " +
    "multi-block container decodes a handful of rows instead of the " +
    "whole file, and a filtered read never truncates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avrolim-")
      .toString
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](writerSchema))
    w.setSyncInterval(32)
    w.create(writerSchema, new File(dir, "big.avro"))
    try (0L until 500L).foreach { k =>
      val r = new GenericData.Record(writerSchema)
      r.put("k", k); r.put("name", s"n$k"); r.put("price", null)
      r.put("extra", 0L)
      w.append(r)
    } finally w.close()
    assert(spark.read.format("graft-avro").load(dir)
      .limit(5).collect().length === 5)
    // white-box: the factory's reader stops after the pushed limit
    val fac = new graft.sources.AvroReaderFactory(
      spark.read.format("graft-avro").load(dir).schema, "_corrupt",
      graft.sources.TleSource.sessionConfProps(), Array.empty, 5)
    val rd = fac.createReader(
      graft.sources.AvroFilePartition(s"$dir/big.avro"))
    var n = 0
    while (rd.next()) n += 1
    rd.close()
    assert(n === 5, "the partition reader must stop at the pushed limit")
    // with a residual filter the scan refuses the limit (row-losing
    // truncation structurally impossible): all matching rows survive
    assert(spark.read.format("graft-avro").load(dir)
      .where($"k" >= 490L).limit(100).collect().length === 10)
  }

  test("partition-directory edges: the PATH value is authoritative " +
    "over a same-named writer field (pruning and reading always " +
    "agree), a failed partition coercion captures its raw text in " +
    "_corrupt, an overwrite sweeps the old k=v skeleton, and the " +
    "archive guard can't be dodged with non-normalized paths") {
    import org.apache.spark.sql.functions.col
    // 1) a foreign writer put a field 'g' INSIDE files that live under
    // g=... dirs with a DIFFERENT value: the path must win, so a
    // filter on the path value can never lose rows to pruning
    val dir = java.nio.file.Files.createTempDirectory("graft-avrosh-")
      .toString
    val shSchema = new Schema.Parser().parse(
      """{"type":"record","name":"sh","fields":[
        |{"name":"k","type":"long"},{"name":"g","type":"string"}]}"""
        .stripMargin)
    Seq("g=red" -> 1L, "g=blue" -> 2L).foreach { case (gdir, k) =>
      new File(s"$dir/$gdir").mkdirs()
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](shSchema))
      w.create(shSchema, new File(s"$dir/$gdir", s"f$k.avro"))
      val r = new GenericData.Record(shSchema)
      r.put("k", k); r.put("g", "payload-value")
      w.append(r); w.close()
    }
    val sh = spark.read.format("graft-avro")
      .schema("k long, g string").load(dir)
    assert(sh.select($"k", $"g").as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "red"), (2L, "blue")),
      "the path value must shadow the same-named writer field")
    assert(sh.where(col("g") === "red").select($"k").as[Long]
      .collect().toSeq === Seq(1L))
    // 2) a partition value that fails the asked type captures its raw
    // text in _corrupt (same PERMISSIVE contract as data fields)
    val nd = java.nio.file.Files.createTempDirectory("graft-avrobadp-")
      .toString
    Seq("b=7", "b=oops").foreach { b =>
      new File(s"$nd/$b").mkdirs()
      writeFile(s"$nd/$b", Seq((1L, "x", "0.0")))
    }
    val bad = spark.read.format("graft-avro")
      .schema("k long, b long, _corrupt string").load(nd)
      .select($"b", $"_corrupt").as[(Option[Long], Option[String])]
      .collect().toSet
    assert(bad === Set((Some(7L), None), (None, Some("oops"))),
      "a bad partition value must null WITH a corrupt capture")
    // 3) an unpartitioned overwrite of a partitioned layout sweeps the
    // empty k=v skeleton — no phantom/colliding partition column later
    val od = java.nio.file.Files.createTempDirectory("graft-avrosw-")
      .toString + "/land"
    Seq((1L, "a"), (2L, "b")).toDF("k", "pr")
      .repartition(col("pr"))
      .write.format("graft-avro").option("partitionBy", "pr")
      .mode("append").save(od)
    assert(graft.sources.AvroSource.partitionSpec(od).map(_._1)
      === Seq("pr"))
    Seq((3L, "c")).toDF("k", "pr")
      .write.format("graft-avro").mode("overwrite").save(od)
    assert(graft.sources.AvroSource.partitionSpec(od).isEmpty,
      "the replaced layout's empty k=v dirs must be swept")
    val after = spark.read.format("graft-avro").load(od)
    assert(after.select($"k", $"pr").as[(Long, String)].collect().toSeq
      === Seq((3L, "c")))
    // 4) the in-landing archive guard normalizes before comparing
    val e = intercept[IllegalArgumentException] {
      graft.sources.LandingArchive.validate(Seq(od), s"$od/./done")
    }
    assert(e.getMessage.contains("sits visibly inside"))
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.LandingArchive.validate(Seq(od), s"$od/_x/../done")
    }
    assert(e2.getMessage.contains("sits visibly inside"))
    // a genuinely hidden subdir still passes
    graft.sources.LandingArchive.validate(Seq(od), s"$od/_archive")
  }

  test("PARTITIONED WRITE (partitionBy option): rows land under k=v " +
    "directories with the partition columns moved out of the payload " +
    "into the path, special characters escape and round-trip, nulls " +
    "become the Hive sentinel, and the layout prunes on read") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-avropw-")
      .toString + "/land"
    Seq(
      (1L, "en", 10L, 1.5), (2L, "en", 11L, 2.5),
      (3L, "fr", 10L, 3.5), (4L, "a=b/c", 12L, 4.5),
      (5L, null.asInstanceOf[String], 13L, 5.5))
      .toDF("k", "lang", "b", "v")
      .repartition(2, col("lang"), col("b"))
      .write.format("graft-avro")
      .option("partitionBy", "lang,b").mode("append").save(dir)
    // layout: k=v dirs, hidden-dot stripped on the FILE component only
    val rels = graft.util.FsListing.dataFiles(dir).map(_._1)
    assert(rels.forall(r => r.matches(
      "lang=[^/]+/b=\\d+/part-\\d{5}-\\d+-[0-9a-f]{8}\\.avro")), rels)
    assert(rels.exists(_.startsWith("lang=a%3Db%2Fc/")),
      s"'=' and '/' in a value must escape: $rels")
    assert(rels.exists(_.startsWith("lang=__HIVE_DEFAULT_PARTITION__/")))
    // payload holds ONLY the data columns; the path carries the rest
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema.fieldNames.sorted.toSeq ===
      Seq("b", "k", "lang", "v"))
    assert(df.select($"k", $"lang", $"b", $"v")
      .as[(Long, Option[String], Long, Double)].collect().sorted.toSeq
      === Seq((1L, Some("en"), 10L, 1.5), (2L, Some("en"), 11L, 2.5),
        (3L, Some("fr"), 10L, 3.5), (4L, Some("a=b/c"), 12L, 4.5),
        (5L, None, 13L, 5.5)))
    // the written layout prunes: lang = 'fr' skips the others' dirs
    val p0 = AvroSource.prunedDirs.get()
    assert(df.where($"lang" === "fr").select($"k").as[Long]
      .collect().toSeq === Seq(3L))
    assert(AvroSource.prunedDirs.get() > p0)
    // a partitionBy column missing from the schema fails at plan time
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("k", "s").write.format("graft-avro")
        .option("partitionBy", "nope").mode("append").save(dir + "2")
    }
    assert(e.getMessage.contains("not in the written schema"))
  }

  test("partition-directory columns flow through the STREAMING read " +
    "too, and a data/partition name collision fails loudly") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avrops-")
      .toString
    val ckp = java.nio.file.Files
      .createTempDirectory("graft-avrops-ckp-").toString
    Seq("g=red", "g=blue").foreach { g =>
      new File(s"$dir/$g").mkdirs()
      writeFile(s"$dir/$g", Seq((g.length.toLong, g, "0.0")))
    }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft-avro")
      .schema("k long, g string")
      .load(dir)
      .writeStream.foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select($"k", $"g").as[(Long, String)].collect().foreach(got.add)
          ()
      }
      .trigger(Trigger.AvailableNow()).option("checkpointLocation", ckp)
      .start()
    q.awaitTermination()
    assert(got.iterator().asScala.toSeq.sorted ===
      Seq((5L, "red"), (6L, "blue")).sorted)
    // collision: a partition directory named like a DATA column
    val bad = java.nio.file.Files.createTempDirectory("graft-avropc-")
      .toString
    new File(s"$bad/name=x").mkdirs()
    writeFile(s"$bad/name=x", Seq((1L, "a", "1.0")))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").load(bad).schema
    }
    assert(e.getMessage.contains("collides"))
  }

  test("archiveDir bounds the landing listing: committed batches' " +
    "files MOVE to the archive, later triggers list only live files, " +
    "archived files are never re-admitted, and new arrivals still " +
    "process exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avroarc-")
      .toString
    val arch = java.nio.file.Files
      .createTempDirectory("graft-avroarc-archive-").toString
    val ckp = java.nio.file.Files
      .createTempDirectory("graft-avroarc-ckp-").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-avro")
        .schema("k long, name string")
        .option("maxFilesPerTrigger", 4)
        .option("archiveDir", arch)
        .load(dir)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select($"k").as[Long].collect().foreach(got.add)
            ()
        }
        .trigger(Trigger.AvailableNow()).option("checkpointLocation", ckp)
        .start()
      q.awaitTermination()
    }
    (0 until 12).foreach(i => writeFile(dir,
      Seq((i.toLong, s"n$i", s"$i.0"))))
    drain()
    assert(got.iterator().asScala.toSeq.sorted === (0L until 12L))
    // the engine commits batch N as batch N+1 starts, so the FINAL
    // batch lags one run (FileStreamSource-cleanup semantics): the
    // landing is bounded by one batch, never by history
    val live1 = graft.util.FsListing.dataFiles(dir).size
    assert(live1 <= 4,
      s"landing must hold at most one trailing batch, saw $live1")
    assert(graft.util.FsListing.dataFiles(arch).size === 12 - live1)
    // new arrivals after archival: only THEY process — the archived
    // names stay in the offset, so nothing is re-admitted
    (100 until 102).foreach(i => writeFile(dir,
      Seq((i.toLong, s"n$i", s"$i.0"))))
    drain()
    assert(got.size === 14, "exactly the two new files' rows arrive")
    val live2 = graft.util.FsListing.dataFiles(dir).size
    assert(live2 <= 2,
      s"the restart must archive the prior run's trailing batch, saw $live2")
    assert(graft.util.FsListing.dataFiles(arch).size === 14 - live2,
      "no file may be lost across the archive boundary")
    // an archive VISIBLY inside the landing is rejected at plan time
    val e = intercept[Exception] {
      spark.readStream.format("graft-avro")
        .schema("k long, name string")
        .option("archiveDir", s"$dir/done")
        .load(dir)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckp-bad")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("sits visibly inside"),
      s"got: ${e.getMessage}")
  }

  test("sidecar index is INCREMENTAL and delta-compacted: a refresh " +
    "over +1 new file stats exactly 1 file into an O(delta) delta, " +
    "vanished files become drops, deltas fold into the base at the " +
    "compaction threshold, and repeat reads of an unchanged index " +
    "parse zero bytes") {
    import graft.sources.SidecarIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-avroinc-")
      .toString
    def indexFiles(pred: String => Boolean): Seq[String] =
      new File(dir).listFiles.map(_.getName).filter(pred).toSeq.sorted
    def deltas() = indexFiles(_.startsWith("_index.delta-"))
    writeFile(dir, (0L until 5L).map(k => (k, s"a$k", s"$k.0")))
    writeFile(dir, (10L until 15L).map(k => (k, s"b$k", s"$k.0")))
    writeFile(dir, (20L until 25L).map(k => (k, s"c$k", s"$k.0")))
    AvroSource.writeIndex(spark, dir)
    assert(SidecarIndex.lastStatted.get() === 3L)
    assert(indexFiles(_ == "_index.json").nonEmpty && deltas().isEmpty)
    // +1 file: exactly one stat, one delta file, no base rewrite
    val baseLen = new File(dir, "_index.json").length
    writeFile(dir, (1000L until 1005L).map(k => (k, s"z$k", s"$k.0")))
    AvroSource.writeIndex(spark, dir)
    assert(SidecarIndex.lastStatted.get() === 1L,
      "a refresh over +1 new file must stat exactly one file")
    assert(deltas().size === 1, "the refresh must write one delta")
    assert(new File(dir, "_index.json").length === baseLen,
      "the base must not be rewritten for a delta refresh")
    assert(AvroSource.readIndex(dir).size === 4)
    // the delta-held entry actively skips: k <= 25 prunes the z file
    val before = AvroSource.skippedFiles.get()
    assert(spark.read.format("graft-avro").load(dir)
      .where($"k" <= 25L).count() === 15L)
    assert(AvroSource.skippedFiles.get() > before,
      "the delta-held high-range file must stats-skip")
    // repeat reads of the unchanged index are cache hits: zero bytes
    AvroSource.readIndex(dir)
    val bytes0 = SidecarIndex.indexBytesRead.get()
    AvroSource.readIndex(dir); AvroSource.readIndex(dir)
    assert(SidecarIndex.indexBytesRead.get() === bytes0,
      "an unchanged index must not be re-read from storage")
    // a vanished file becomes a DROP and leaves the merged index —
    // the victim is the a-file (all k < 10), found by content
    val victim = graft.util.FsListing.dataFiles(dir).map(_._1).find { r =>
      spark.read.format("graft-avro").load(s"$dir/$r")
        .selectExpr("max(k)").as[Long].head() < 10L
    }.get
    new File(dir, victim).delete()
    AvroSource.writeIndex(spark, dir)
    assert(SidecarIndex.lastStatted.get() === 0L)
    assert(AvroSource.readIndex(dir).size === 3)
    // churn refreshes past the threshold fold into a fresh base
    (0 until SidecarIndex.CompactThreshold + 2).foreach { i =>
      writeFile(dir, Seq((5000L + i, s"w$i", "1.0")))
      AvroSource.writeIndex(spark, dir)
    }
    assert(deltas().size <= SidecarIndex.CompactThreshold,
      s"deltas must compact: ${deltas()}")
    val all = AvroSource.readIndex(dir)
    assert(all.size === 3 + SidecarIndex.CompactThreshold + 2)
    // the compacted index still answers: every w-file entry skips a
    // k <= 25 scan alongside the original survivors
    assert(spark.read.format("graft-avro").load(dir)
      .where($"k" <= 25L).count() === 10L)
  }
}

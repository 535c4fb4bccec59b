package graft

import org.apache.spark.sql.functions._

import graft.ext.Fingerprint

/** Order-invariant dataset content fingerprint: layout independence,
  * content sensitivity, null-vs-empty distinction, empty identity.
  */
class FingerprintSpec extends SparkSpec {

  import spark.implicits._

  private val base = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5))
    .toDF("id", "grp", "val")
  private val cols = Seq("id", "grp", "val")

  test("invariant to row order, partitioning, and duplication-free " +
    "re-layout; sensitive to any content change") {
    val fp = Fingerprint.dataset(base, cols)
    assert(fp === Fingerprint.dataset(base.orderBy(desc("id")), cols))
    assert(fp === Fingerprint.dataset(base.repartition(7), cols))
    assert(fp === Fingerprint.dataset(base.coalesce(1), cols))
    // any single-cell change moves the fingerprint
    assert(fp !== Fingerprint.dataset(
      base.withColumn("val", when($"id" === 2L, 9.9).otherwise($"val")),
      cols))
    // a dropped row moves it; so does an added one
    assert(fp !== Fingerprint.dataset(base.where($"id" =!= 3L), cols))
    assert(fp !== Fingerprint.dataset(
      base.unionAll(Seq((4L, "d", 4.5)).toDF("id", "grp", "val")), cols))
    // column subset fingerprints differ from full-row ones
    assert(fp !== Fingerprint.dataset(base, Seq("id", "grp")))
  }

  test("NULL is distinct from empty string; empty dataset is 0; the " +
    "even-multiplicity XOR cancellation is real (document the trade)") {
    val withEmpty = Seq((3L, "", 3.5)).toDF("id", "grp", "val")
    val withNull = Seq((3L, null.asInstanceOf[String], 3.5))
      .toDF("id", "grp", "val")
    assert(Fingerprint.dataset(withEmpty, cols) !==
      Fingerprint.dataset(withNull, cols))
    assert(Fingerprint.dataset(base.where(lit(false)), cols) === 0L)
    // a row twice XORs away — the documented multiset caveat (PK
    // tables can't hit it; dedup first elsewhere)
    val doubled = base.unionAll(base.where($"id" === 1L))
    assert(Fingerprint.dataset(doubled, cols) ===
      Fingerprint.dataset(base.where($"id" =!= 1L), cols))
  }

  test("FingerprintStore maintains the fingerprint incrementally " +
    "across append/delete/update/MoR-delete — always == recompute") {
    import graft.pipeline.Warehouse
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-fp-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(StructType(Seq(
        StructField("id", LongType), StructField("grp", StringType),
        StructField("val", DoubleType))))))
    wh.bootstrap()
    def mk(ids: Range) = ids.map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "val")
    val cols = Seq("id", "grp", "val")
    def check(): Unit = {
      val (inc, v) = graft.ext.FingerprintStore.refresh(wh, "t", cols)
      assert(inc === Fingerprint.dataset(wh.read("t"), cols))
      assert(v === wh.versions("t").max)
      // immediate re-refresh is a watermark no-op with the same answer
      assert(graft.ext.FingerprintStore.refresh(wh, "t", cols)._1 === inc)
    }
    wh.append("t", mk(1 to 100)); check()
    wh.append("t", mk(101 to 150)); check()
    wh.delete("t", $"id" % 7 === 0); check()
    wh.update("t", $"grp" === "g1", Map("val" -> ($"val" * 2))); check()
    wh.deleteVectored("t", $"id" % 11 === 0); check()
    // RESTORE past the vectored delete: the rollback's resurrections
    // must reach the feed as +1 rows (the DV-shrink case) — both the
    // raw feed and the incrementally folded fingerprint must see them
    val preRestore = wh.versions("t").max
    wh.restore("t", preRestore - 1) // back before the MoR delete
    val feed = wh.readChangeFeed("t", preRestore)
    import org.apache.spark.sql.functions.col
    val resurrected = feed.where(col("_change_delta") === 1)
      .select($"id").as[Long].collect().toSet
    assert(resurrected.nonEmpty && resurrected.forall(_ % 11 == 0),
      "restore must emit the un-deleted rows as +1 resurrections")
    check()
    // a GC'd feed falls back to recompute instead of failing: vacuum
    // away history, then mutate from a stale watermark
    wh.append("t", mk(151 to 160))
    wh.vacuum("t", keepManifests = 1)
    check()
  }

  test("field boundaries are injection-proof: a delimiter inside a " +
    "value cannot shift content across columns") {
    val a = Seq(("a|b", "c")).toDF("x", "y")
    val b = Seq(("a", "b|c")).toDF("x", "y")
    assert(Fingerprint.dataset(a, Seq("x", "y")) !==
      Fingerprint.dataset(b, Seq("x", "y")))
  }

  test("the fold is shuffle-free: one partial aggregate, no Exchange") {
    val plan = base.repartition(8)
      .agg(bit_xor(Fingerprint.rowKey(cols.map(col))))
      .queryExecution.executedPlan.toString
    // the repartition itself is one exchange; the agg must not add a
    // second full shuffle (partial -> single-partition merge only)
    assert(plan.split("Exchange").length <= 3,
      s"unexpected extra shuffle in:\n$plan")
  }
}

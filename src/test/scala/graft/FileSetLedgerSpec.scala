package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.{FileSetLedger, TleFileSetOffset}

/** Ledger-compacted file-set offsets: a long-lived landing directory's
  * checkpoint writes stay O(tail) bytes instead of O(|files ever
  * seen|), with the exactly-once new-minus-old math (and out-of-order
  * name robustness) of the full-list form preserved.
  */
class FileSetLedgerSpec extends SparkSpec {

  import spark.implicits._

  private def names(n: Int, prefix: String = "/land/part-"): Seq[String] =
    (0 until n).map(i => f"$prefix$i%06d.avro")

  test("offset bytes stay BOUNDED across a 10k-file history: ledger " +
    "freeze + tail ride + re-freeze, all round-tripping the exact set") {
    val ck = Files.createTempDirectory("graft-ledger-").toString
    val ledger = new FileSetLedger(ck)
    // below the bound: plain full-list form (legacy wire shape)
    val small = ledger.offsetFor(names(100))
    assert(small.json().startsWith("["), "small sets stay the array form")
    assert(TleFileSetOffset.fromJson(small.json()).files.toSet
      === names(100).toSet)
    // 10k files: freezes a ledger; the offset carries a path + empty
    // tail instead of 10k names
    val big = names(10000)
    val off = ledger.offsetFor(big)
    val fullArrayLen = TleFileSetOffset(big).json().length
    assert(off.json().length < fullArrayLen / 20,
      s"compact offset (${off.json().length} B) must be far below the " +
        s"full array ($fullArrayLen B)")
    assert(TleFileSetOffset.fromJson(off.json()).files.toSet === big.toSet,
      "expansion must recover the exact set")
    // +100 late files (names sorting BEFORE the frozen ones — the
    // out-of-order case): the same ledger is reused, only the tail grows
    val late = (0 until 100).map(i => f"/land/aaa-$i%03d.avro")
    val off2 = ledger.offsetFor(big ++ late)
    assert(off2.ledgerRef.map(_._1) === off.ledgerRef.map(_._1),
      "a small delta must ride the existing ledger")
    assert(off2.ledgerRef.get._2.toSet === late.toSet)
    assert(off2.json().length < fullArrayLen / 10)
    assert(TleFileSetOffset.fromJson(off2.json()).files.toSet
      === (big ++ late).toSet)
    // tail outgrows the bound: a NEW ledger freezes, tail resets
    val wave = (0 until 600).map(i => f"/land/zzz-$i%03d.avro")
    val off3 = ledger.offsetFor(big ++ late ++ wave)
    assert(off3.ledgerRef.map(_._1) !== off.ledgerRef.map(_._1),
      "an outgrown tail must re-freeze")
    assert(off3.ledgerRef.get._2.isEmpty)
    assert(off3.json().length < fullArrayLen / 20)
    assert(TleFileSetOffset.fromJson(off3.json()).files.toSet
      === (big ++ late ++ wave).toSet)
  }

  test("restart adoption: a fresh ledger instance deserializing a " +
    "compact offset rides its ledger instead of re-freezing; a repeated " +
    "freeze of the same listing is a no-op (content-named)") {
    val ck = Files.createTempDirectory("graft-ledger2-").toString
    val l1 = new FileSetLedger(ck)
    val all = names(2000)
    val off = l1.offsetFor(all)
    // restart: new instance (fresh JVM shape), deserialize + adopt
    val l2 = new FileSetLedger(ck)
    val restored = l2.adopt(TleFileSetOffset.fromJson(off.json()))
    assert(restored.files.toSet === all.toSet)
    val off2 = l2.offsetFor(all ++ names(10, "/land/new-"))
    assert(off2.ledgerRef.map(_._1) === off.ledgerRef.map(_._1),
      "the adopted ledger must be reused after restart")
    assert(off2.ledgerRef.get._2.size === 10)
    // same listing frozen twice lands on the same content-named file
    val l3 = new FileSetLedger(ck)
    assert(l3.offsetFor(all).ledgerRef.map(_._1)
      === off.ledgerRef.map(_._1))
  }

  test("ledger GC: repeated freezes retain only the newest snapshots, " +
    "and the retained ones still serve restarts") {
    val ck = Files.createTempDirectory("graft-ledger3-").toString
    val ledger = new FileSetLedger(ck)
    // 15 growth waves, each big enough to outgrow the tail bound and
    // force a fresh freeze
    var all = names(600)
    var last = ledger.offsetFor(all)
    (1 to 15).foreach { w =>
      all = all ++ names(600, f"/land/w$w%02d-")
      last = ledger.offsetFor(all)
    }
    val dir = Paths.get(ck, "graft-file-ledger")
    val ledgers = Files.list(dir).toArray.map(_.toString)
      .filter(_.contains("/ledger-"))
    assert(ledgers.length <= 8,
      s"expected at most 8 retained ledgers, found ${ledgers.length}")
    // the newest (referenced) snapshot survived and restores exactly
    val restored = TleFileSetOffset.fromJson(last.json())
    assert(restored.files.toSet === all.toSet)
  }

  test("END TO END: a 600-file landing crosses the compaction bound " +
    "and a checkpoint restart stays exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-ledgere2e-").toString
    val ckp = Files.createTempDirectory("graft-ledgere2e-ckp-").toString
    val out = Files.createTempDirectory("graft-ledgere2e-out-").toString
    def land(i: Int): Unit = {
      Files.write(Paths.get(dir, f"w-$i%05d.txt"),
        s"SAT-$i\n1 ${i}U\n2 $i\n".getBytes(StandardCharsets.UTF_8))
      ()
    }
    (0 until 600).foreach(land)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-tle").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 600L)
    // the committed offset must be the COMPACT form referencing a
    // ledger under the checkpoint dir
    val offsetsDir = Paths.get(ckp, "offsets")
    val lastOffset = Files.list(offsetsDir).toArray.map(_.toString)
      .filterNot(_.endsWith(".crc")).sorted.last
    val text = new String(Files.readAllBytes(Paths.get(lastOffset)),
      StandardCharsets.UTF_8)
    assert(text.contains("graft-file-ledger"),
      s"committed offset must reference a ledger snapshot: $text")
    // second wave + restart: exactly the new records, no replays
    (600 until 605).foreach(land)
    runOnce()
    val got = spark.read.parquet(out).select($"sat_name").as[String]
      .collect().toSeq
    assert(got.length === 605)
    assert(got.toSet === (0 until 605).map(i => s"SAT-$i").toSet)
  }
}

package graft

import java.nio.file.Files

import graft.ingest.{NoaaJson, TleText}

/** T1 ordered triple-grouping + S3/X3 NOAA decode over real files. */
class TleTextSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-fixture")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  private val l1 =
    "1 44714U 19074B   26012.91667824  .00001264  00000+0  16538-3 0  9996"
  private val l2 =
    "2 44714  53.0542 203.1424 0001452  85.3017 274.8138 15.06391571338133"

  test("triples preserve file order and drop the trailing partial") {
    val text = Seq(
      "SAT-A", l1, l2,
      "SAT-B  ", "  " + l1, l2 + "  ", // padded lines are stripped
      "SAT-C", l1 // trailing PARTIAL triple → silently dropped
    ).mkString("\n")
    val path = writeFixture("tle.txt", text)
    val out = TleText.triples(spark, path).orderBy("grp").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("sat_name") === "SAT-A")
    assert(out(1).getAs[String]("sat_name") === "SAT-B")
    assert(out(1).getAs[String]("l1") === l1) // stripped
  }

  test("leading/trailing blank lines don't shift triple alignment") {
    // reference does response.text.strip().splitlines() (script.py:119):
    // boundary blanks vanish, INTERIOR blanks still count as lines
    val text = "\n\n" + Seq("SAT-A", l1, l2).mkString("\n") + "\n\n"
    val out = TleText.triples(spark, writeFixture("tle3.txt", text))
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("sat_name") === "SAT-A")
    assert(out(0).getAs[String]("l1") === l1)

    // an interior blank line occupies a slot (parity with splitlines)
    val text2 = Seq("SAT-A", l1, "", "SAT-B", l1, l2).mkString("\n")
    val out2 = TleText.triples(spark, writeFixture("tle4.txt", text2))
      .orderBy("grp").collect()
    assert(out2.length === 2)
    assert(out2(0).getAs[String]("l2") === "") // blank slot preserved

    // all-blank input → empty result, no crash
    assert(TleText.triples(spark, writeFixture("tle5.txt", "\n\n\n"))
      .count() === 0)
  }

  test("triples reject multi-file directories (single-payload contract)") {
    // cross-file triple alignment in listing order would be silent
    // corruption — the guard redirects to the per-file graft-tle source
    val dir = Files.createTempDirectory("graft-multi")
    Files.writeString(dir.resolve("a.txt"), Seq("SAT-A", l1, l2).mkString("\n"))
    Files.writeString(dir.resolve("b.txt"), Seq("SAT-B", l1, l2).mkString("\n"))
    val err = intercept[IllegalArgumentException] {
      TleText.triples(spark, dir.toString)
    }
    assert(err.getMessage.contains("graft-tle"))
    // a single-file directory still works (one payload, just nested)
    val one = Files.createTempDirectory("graft-single")
    Files.writeString(one.resolve("only.txt"), Seq("SAT-A", l1, l2).mkString("\n"))
    assert(TleText.triples(spark, one.toString).count() === 1)
  }

  test("records: malformed triple dropped, valid parsed, fetched_at constant") {
    val text = Seq(
      "SAT-A", l1, l2,
      "SAT-BAD", "1 garbage", "2 garbage",
      "SAT-C", l1, l2).mkString("\n")
    val path = writeFixture("tle2.txt", text)
    val t0 = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    val recs = TleText.records(spark, path, t0).collect()
    assert(recs.length === 2)
    assert(recs.map(_.getAs[String]("sat_name")).sorted === Array("SAT-A", "SAT-C"))
    assert(recs.forall(_.getAs[java.sql.Timestamp]("fetched_at_utc") == t0))
    assert(recs.forall(_.getAs[Int]("norad_id") == 44714))
  }

  test("HttpFetch.land publishes atomically and feeds the TLE readers") {
    import graft.ingest.HttpFetch
    val dir = Files.createTempDirectory("graft-landing").toString
    val payload = Seq("SAT-A", l1, l2).mkString("\n")
    val landed = HttpFetch.land(payload, dir, "celestrak-batch1.txt")
    // no temp leftovers, one visible data file
    assert(graft.util.FsListing.dataFiles(dir).map(_._1) ===
      Seq("celestrak-batch1.txt"))
    // both readers consume it under their normal contracts
    assert(TleText.triples(spark, landed).count() === 1)
    assert(spark.read.format("graft-tle").load(dir).count() === 1)
    // landed files are immutable: re-landing the same name fails
    intercept[IllegalStateException] {
      HttpFetch.land("other", dir, "celestrak-batch1.txt")
    }
    // hidden names would vanish from listings — rejected up front
    intercept[IllegalArgumentException] {
      HttpFetch.land(payload, dir, "_sneaky.txt")
    }
  }

  test("noaa decode: header skipped, date split at space, floats parsed") {
    val json =
      """[["time_tag","f10.7"],
        | ["2026-08-10 00:00:00","135.2"],
        | ["2026-08-11 00:00:00","141.0"]]""".stripMargin
    val path = writeFixture("noaa.json", json)
    val out = NoaaJson.decode(spark, path).orderBy("date_utc").collect()
    assert(out.length === 2)
    assert(out(0).getAs[java.sql.Date]("date_utc").toString === "2026-08-10")
    assert(out(0).getAs[Double]("f10_7_flux") === 135.2)
    assert(out(1).getAs[Double]("f10_7_flux") === 141.0)
  }
}

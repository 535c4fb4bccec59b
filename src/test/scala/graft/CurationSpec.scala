package graft

import org.apache.spark.sql.functions._

import graft.ext.{Cleaning, Curation, Decontam}

/** Semantic checks for the curation trio: PII scrub, budgeted
  * selection, decontamination — the properties the oracle gate states
  * only as end-to-end hashes (exact prefix semantics under ties and
  * zero-cost rows, staged-mask counting, broadcast-side collapse).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- Cleaning ----

  test("redact masks emails, urls and long digit runs with their tags") {
    val out = Seq(
      "mail me at a.b-c@ex-ample.org today",
      "read https://ex.org/a/1234567?q=2 now",
      "acct 12345678 and 123456 short",
      "clean text only").toDF("text")
      .select(Cleaning.redact(col("text")).as("r")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "read <URL> now")
    assert(out(2) === "acct <NUM> and 123456 short") // 6 digits: kept
    assert(out(3) === "clean text only")
  }

  test("redactionCounts never double-counts a span across categories") {
    // the URL contains 7+ digits: digit-run counting runs on the
    // URL-masked text, so the run inside the URL is not also a <NUM>
    val df = Seq("x https://ex.org/1234567890 y 9876543 z a@b.io")
      .toDF("text")
    val counts = Cleaning.redactionCounts(col("text"))
    val row = df.select(counts.map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getInt(0) === 1) // email
    assert(row.getInt(1) === 1) // url
    assert(row.getInt(2) === 1) // only the bare digit run
  }

  test("clean collapses whitespace after masking") {
    val out = Seq("a@b.io   has\t left\n\nus").toDF("text")
      .select(Cleaning.clean(col("text"))).as[String].collect()(0)
    assert(out === "<EMAIL> has left us")
  }

  test("stripHtml drops block content, keeps prose, decodes entities") {
    val html =
      """<HTML><head><STYLE a=b>h1 { x: y; }</style></head><body>
        |<!-- a
        | multiline comment --><p class="x">keep &amp;lt; 1 < 2 ok</p>
        |<script type="t">var s = "</p>"; if (1 < 2) alert();</script>
        |A&nbsp;B &quot;q&quot; it&#39;s &gt;end&lt;</body>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(Cleaning.stripHtml(col("h"))).as[String].collect()(0)
    // script/style lose their CONTENT (incl. the embedded </p> and <);
    // the free-standing `<` in prose survives; &amp;lt; decodes ONCE to
    // the literal text `&lt;`; tags are word breaks, case-insensitive
    assert(out === "keep &lt; 1 < 2 ok A B \"q\" it's >end<")
  }

  // ---- Curation ----

  private lazy val scored = Seq(
    // (id, grp, quality, cost) — en budget tests ordering + boundary
    (1L, "en", 0.9, 10L),
    (2L, "en", 0.8, 10L),
    (3L, "en", 0.7, 10L),
    (4L, "en", 0.6, 10L),
    (5L, "de", 0.5, 100L),
    (6L, "de", 0.4, 1L)).toDF("doc_id", "lang", "quality", "toks")

  private def take(budget: Long, buckets: Int = 4) =
    Curation.takeByBudget(scored, Seq("lang"), col("quality"),
      Seq("doc_id"), col("toks"), budget, buckets = buckets)
      .select("doc_id").as[Long].collect().sorted

  test("takeByBudget keeps the best-first prefix within the budget") {
    assert(take(25) === Array(1L, 2L))       // 10+10 fits, +10 would not
    assert(take(100) === Array(1L, 2L, 3L, 4L, 5L)) // de: 100 fits, 101 not
    assert(take(5) === Array[Long]())        // nothing fits
  }

  test("takeByBudget is exact across bucket granularities") {
    for (b <- Seq(2, 3, 10, 1000))
      assert(take(30, buckets = b) === Array(1L, 2L, 3L),
        s"buckets=$b")
  }

  test("takeByBudget matches the naive single-window semantics on ties") {
    // equal quality: doc_id ascending breaks the tie
    val tied = Seq(
      (10L, "en", 0.5, 10L), (11L, "en", 0.5, 10L), (12L, "en", 0.5, 10L))
      .toDF("doc_id", "lang", "quality", "toks")
    val out = Curation.takeByBudget(tied, Seq("lang"),
        col("quality"), Seq("doc_id"), col("toks"), 20L)
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(10L, 11L))
  }

  test("takeByBudget keeps zero-cost rows sitting exactly on the budget") {
    val z = Seq(
      (1L, "en", 0.9, 10L), (2L, "en", 0.8, 0L), (3L, "en", 0.7, 5L))
      .toDF("doc_id", "lang", "quality", "toks")
    val out = Curation.takeByBudget(z, Seq("lang"), col("quality"),
        Seq("doc_id"), col("toks"), 10L)
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L)) // cum: 10, 10, 15
  }

  // ---- Decontam ----

  test("overlap flags benchmark containment and partial contamination") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // = bench doc
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // superset
      (3L, "totally unrelated words with no bench fivegrams here ok"))
      .toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val out = Decontam.overlap(corpus, "doc_id", "text", bench, "text", n = 5)
      .select("doc_id", "n_shingles", "n_hit", "overlap")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1) === Array(1L, 2L)) // doc 3 absent (no hits)
    assert(out(0) === ((1L, 2L, 2L, 1.0)))  // fully contained
    val (_, n2, h2, r2) = out(1)
    assert(n2 === 4L && h2 === 2L && r2 === 0.5) // 2 of 4 fivegrams hit
  }

  test("overlap broadcasts the collapsed benchmark side") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq("a b c d e f").toDF("text")
    val plan = Decontam.overlap(corpus, "doc_id", "text", bench, "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }
}

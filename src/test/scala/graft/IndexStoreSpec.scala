package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{NearDup, PQ, Similarity}
import graft.pipeline.{IndexStore, Warehouse}

/** Persisted, incrementally-maintained index artifacts (IndexStore):
  * the incremental-refresh == full-rebuild contracts, the probe ==
  * refit contracts, stale-entry behavior under source DELETE/UPDATE,
  * the watermark no-op, and PQ codebook round-tripping.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def freshDocsWh(): Warehouse = {
    val dir = Files.createTempDirectory("graft-idx-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("docs" -> Warehouse.TableSpec(docSchema)))
    wh.bootstrap()
    wh
  }

  // deterministic toy corpus: every doc id ending in 5 is an exact
  // duplicate of doc id-5 (which keeps its own text — no chaining)
  private def docs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("doc_id")
      .withColumn("base",
        when(col("doc_id") % 10 === 5, col("doc_id") - 5)
          .otherwise(col("doc_id")))
      .select(col("doc_id"), concat(lit("alpha beta gamma delta "),
        col("base"), lit(" epsilon zeta"), lit(" tok"), col("base") % 7)
        .as("text"))

  test("minhash index: incremental refresh equals full rebuild " +
      "bit-for-bit; probe equals fresh minhashLshPairs") {
    val wh = freshDocsWh()
    wh.append("docs", docs(0, 43))
    val v1 = IndexStore.refreshMinhash(wh, "docs", "idx_mh", "doc_id",
      "text", n = 2, numHashes = 16, nParts = 4)
    assert(IndexStore.indexedVersion(wh, "idx_mh", "docs") === Some(v1))
    wh.append("docs", docs(43, 70))
    val v2 = IndexStore.refreshMinhash(wh, "docs", "idx_mh", "doc_id",
      "text", n = 2, numHashes = 16, nParts = 4)
    assert(v2 > v1)
    // incremental signatures == full re-sign of the current corpus
    val incr = wh.read("idx_mh").select("doc_id", "sig")
      .as[(Long, Seq[Long])].collect().toMap
    val full = NearDup.minhashSignatures(wh.read("docs"), "doc_id",
        "text", n = 2, numHashes = 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(incr === full)
    // probe from the persisted index == fresh end-to-end LSH run
    val probe = IndexStore.minhashProbePairs(wh, "docs", "idx_mh",
        "doc_id", "text", n = 2, numHashes = 16, numBands = 4,
        minJaccard = 1.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val fresh = NearDup.minhashLshPairs(wh.read("docs"), "doc_id",
        "text", n = 2, numHashes = 16, numBands = 4, minJaccard = 1.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(probe === fresh)
    assert(probe.nonEmpty) // the planted dups are found
    // cross-batch pairs exist: doc 45 (batch 2) duplicates doc 40
    // (batch 1, signed in the FIRST refresh) — the index finds the
    // pair without ever re-signing batch 1
    assert(probe.exists { case (a, b) => a < 43 && b >= 43 })
  }

  test("minhash index: refresh is a watermark no-op at head; source " +
      "UPDATE replaces the stale signature; DELETE is probe-harmless " +
      "and compactIndex reclaims it") {
    val wh = freshDocsWh()
    wh.append("docs", docs(0, 30))
    IndexStore.refreshMinhash(wh, "docs", "idx_mh", "doc_id", "text",
      n = 2, numHashes = 16, nParts = 4)
    val nIdxVersions = wh.versions("idx_mh").size
    // no source change → refresh must not commit anything
    IndexStore.refreshMinhash(wh, "docs", "idx_mh", "doc_id", "text",
      n = 2, numHashes = 16, nParts = 4)
    assert(wh.versions("idx_mh").size === nIdxVersions)
    // UPDATE rewrites doc 7's text; the refresh must REPLACE its
    // signature (the rewritten partition reappears in the diff)
    wh.update("docs", col("doc_id") === 7,
      Map("text" -> lit("totally different words now")))
    IndexStore.refreshMinhash(wh, "docs", "idx_mh", "doc_id", "text",
      n = 2, numHashes = 16, nParts = 4)
    val sigs = wh.read("idx_mh").where(col("doc_id") === 7)
      .select("sig").as[Seq[Long]].collect()
    assert(sigs.length === 1) // replaced, not duplicated
    val expected = NearDup.minhashSignatures(
        wh.read("docs").where(col("doc_id") === 7), "doc_id", "text",
        n = 2, numHashes = 16)
      .select("_sig").as[Seq[Long]].head()
    assert(sigs.head === expected)
    // DELETE doc 10 (an original with a planted dup at 15): the stale
    // index row must not produce a pair (inner join against live docs
    // drops it), and compactIndex removes exactly the stale ids
    wh.delete("docs", col("doc_id") === 10)
    val probe = IndexStore.minhashProbePairs(wh, "docs", "idx_mh",
        "doc_id", "text", n = 2, numHashes = 16, numBands = 4,
        minJaccard = 1.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!probe.exists { case (a, b) => a == 10L || b == 10L })
    assert(wh.read("idx_mh").where(col("doc_id") === 10).count() === 1L)
    IndexStore.compactIndex(wh, "docs", "idx_mh", "doc_id")
    assert(wh.read("idx_mh").where(col("doc_id") === 10).count() === 0L)
    assert(wh.read("idx_mh").count() === wh.read("docs").count())
  }

  test("sigkey membership probe opens a STRICT SUBSET of index files " +
    "(bloom sidecars): a corrupted skipped file is never read; legacy " +
    "indexes upgrade in place") {
    val wh = freshDocsWh()
    wh.append("docs", docs(0, 400))
    IndexStore.refreshMinhash(wh, "docs", "sig_idx", "doc_id", "text",
      numHashes = 16)
    val allFiles = wh.read("sig_idx").inputFiles.toSet
    assert(allFiles.size >= 8, s"want many index files, got $allFiles")
    // probe three known docs' sigkeys — the per-epoch streaming shape
    val keys = IndexStore.minhashRows(
        docs(0, 400).where(col("doc_id").isin(3L, 77L, 201L)),
        "doc_id", "text", 3, 16, 16)
      .select("sigkey")
    val probe = wh.probeKeys("sig_idx", Seq("sigkey"), keys).get
    val probed = probe.inputFiles.toSet
    assert(probed.nonEmpty && probed.subsetOf(allFiles) &&
        probed.size < allFiles.size,
      s"probe must open a strict subset: ${probed.size}/${allFiles.size}")
    // the proof skipping is real: corrupt a SKIPPED file — the probe
    // still answers; a full index scan no longer can
    val skipped = (allFiles -- probed).head
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        if (skipped.startsWith("file:")) new java.net.URI(skipped).getPath
        else skipped),
      "garbage".getBytes)
    assert(probe.join(keys, Seq("sigkey"), "left_semi").count() === 3L)
    intercept[Exception] { wh.read("sig_idx").count() }

    // legacy upgrade: an index created WITHOUT the bloom declaration
    // gains it (plus backfilled sidecars) on the next ensure call
    val wh2 = freshDocsWh()
    wh2.append("docs", docs(0, 50))
    wh2.createTable("old_idx", Warehouse.TableSpec(
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("part", IntegerType),
        StructField("sig", ArrayType(LongType)),
        StructField("sigkey", LongType))),
      partitionBy = Seq("part")))
    assert(!wh2.tableSpec("old_idx").bloomColumns.contains("sigkey"))
    // the next maintainer touch (refresh calls ensureMinhashTable)
    // upgrades the legacy spec and backfills sidecars for live files
    IndexStore.refreshMinhash(wh2, "docs", "old_idx", "doc_id", "text",
      numHashes = 16)
    assert(wh2.tableSpec("old_idx").bloomColumns.contains("sigkey"))
    // sidecars were backfilled: a probe now skips files here too
    val keys2 = IndexStore.minhashRows(
        docs(0, 50).where(col("doc_id") === 7L),
        "doc_id", "text", 3, 16, 16).select("sigkey")
    val probed2 = wh2.probeKeys("old_idx", Seq("sigkey"), keys2)
      .get.inputFiles.toSet
    assert(probed2.size < wh2.read("old_idx").inputFiles.size)
  }

  test("compactIndex reclaims 100k+ stale ids with no data-sized " +
      "driver materialization (join-driven delete, no IN-list plan)") {
    val dir = Files.createTempDirectory("graft-idxc-").toString
    val idSchema = StructType(Seq(StructField("doc_id", LongType)))
    val idxSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", LongType)))
    val wh = new Warehouse(spark, dir, specs = Map(
      "s" -> Warehouse.TableSpec(idSchema),
      "i" -> Warehouse.TableSpec(idxSchema)))
    wh.bootstrap()
    // 120k index entries, only 10k still live in the source → 110k
    // stale ids. The pre-r9 shape (collect + isInCollection) would put
    // a 110k-element literal list in the plan; the join-driven delete
    // must keep every plan's IN-lists bounded.
    wh.append("i", spark.range(0, 120000).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 3))
    wh.append("s", spark.range(0, 10000).toDF("doc_id"))
    val bigIn = new java.util.concurrent.atomic.AtomicInteger(0)
    val sawMarker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.catalyst.expressions.{In, InSet}
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        if (qe.analyzed.output.exists(_.name == "__drain_marker"))
          sawMarker.set(true)
        else qe.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
          case in: In if in.list.length > 1000 => bigIn.incrementAndGet()
          case is: InSet if is.hset.size > 1000 => bigIn.incrementAndGet()
          case _ =>
        }))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val removed = IndexStore.compactIndex(wh, "s", "i", "doc_id")
      assert(removed === 110000L)
      // listener delivery is async but FIFO: run a recognizable marker
      // query and poll until its event lands — every compactIndex plan
      // event is then delivered too
      spark.range(0, 1).toDF("__drain_marker").collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sawMarker.get() && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(sawMarker.get(), "listener bus did not drain in 30s")
    } finally spark.listenerManager.unregister(listener)
    assert(bigIn.get() === 0,
      s"compactIndex planned ${bigIn.get()} data-sized IN-list(s)")
    assert(wh.read("i").count() === 10000L)
    assert(wh.read("i").join(wh.read("s"), Seq("doc_id"), "left_anti")
      .count() === 0L)
    // idempotent: nothing stale left → no-op, no new commit
    val nv = wh.versions("i").size
    assert(IndexStore.compactIndex(wh, "s", "i", "doc_id") === 0L)
    assert(wh.versions("i").size === nv)
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def freshEmbWh(): Warehouse = {
    val dir = Files.createTempDirectory("graft-idxv-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("emb" -> Warehouse.TableSpec(embSchema)))
    wh.bootstrap()
    wh
  }

  // deterministic 8-dim embeddings
  private def embs(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(0), lit(7)), i =>
        (sin(col("vec_id") * 0.7 + i * 1.3) +
          cos(col("vec_id") * 0.3 - i)).cast("float")).as("embedding"))

  test("ivf index: incremental assignment under persisted centroids " +
      "equals full re-assignment; probe-all equals brute force") {
    val wh = freshEmbWh()
    wh.append("emb", embs(0, 120))
    IndexStore.buildIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nCells = 6, fitFraction = 1.0, nParts = 4)
    wh.append("emb", embs(120, 200))
    IndexStore.refreshIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nParts = 4)
    // the incrementally-maintained assignments == assigning the whole
    // corpus from scratch against the SAME persisted centroids: build
    // a second index over the full corpus reusing the first's centroid
    // table, then compare
    val cents = wh.read("idx_ivf_centroids")
    val wh2 = freshEmbWh()
    wh2.append("emb", embs(0, 200))
    wh2.createTable("idx_ivf_centroids",
      Warehouse.TableSpec(cents.schema), initial = Some(cents))
    IndexStore.refreshIvf(wh2, "emb", "idx_ivf", "vec_id", "embedding",
      nParts = 4)
    val a = wh.read("idx_ivf_vectors").select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val b = wh2.read("idx_ivf_vectors").select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    assert(a === b)
    assert(a.size === 200)
    // probe-all invariant: nProbe == nCells scores every pair exactly
    // once → identical to the exact brute-force baseline
    val queries = wh.read("emb").where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probed = IndexStore.ivfProbeTopK(wh, "idx_ivf", "vec_id",
        queries, "qid", "qvec", k = 5, nProbe = 6)
      .select("qid", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(wh.read("emb"), "vec_id",
        "embedding", queries, "qid", "qvec", k = 5)
      .select("qid", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(probed === brute)
  }

  test("ivf drift: an in-distribution second batch keeps the staleness " +
      "ratio near 1, a shifted batch trips needsRefit, and probe-all " +
      "recall stays exact throughout") {
    val wh = freshEmbWh()
    wh.append("emb", embs(0, 150))
    IndexStore.buildIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nCells = 6, fitFraction = 1.0, nParts = 4)
    val d0 = IndexStore.ivfDrift(wh, "idx_ivf").get
    assert(d0.ratio === 1.0) // baseline IS the latest commit
    // in-distribution arrivals: same generator, new ids → mean
    // assigned distance stays in family
    wh.append("emb", embs(150, 250))
    IndexStore.refreshIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nParts = 4)
    val d1 = IndexStore.ivfDrift(wh, "idx_ivf").get
    assert(d1.ratio < 2.0 && !d1.needsRefit(),
      s"in-distribution batch flagged stale: $d1")
    // distribution SHIFT: vectors offset far outside the fitted cloud
    // (embs values are in [-2, 2]; +25 per dim is ~unreachable)
    val shifted = spark.range(250, 330).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(0), lit(7)), i =>
        (sin(col("vec_id") * 0.7 + i * 1.3) + lit(25.0)).cast("float"))
        .as("embedding"))
    wh.append("emb", shifted)
    IndexStore.refreshIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nParts = 4)
    val d2 = IndexStore.ivfDrift(wh, "idx_ivf").get
    assert(d2.needsRefit(),
      s"shifted batch did not trip the drift signal: $d2")
    assert(d2.buildMeanD2 === d0.buildMeanD2) // baseline pinned to build
    // the probe-all INVARIANT is distribution-independent: even with a
    // badly-fitting quantizer, nProbe == nCells equals brute force
    val queries = wh.read("emb").where(col("vec_id") % 60 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probed = IndexStore.ivfProbeTopK(wh, "idx_ivf", "vec_id",
        queries, "qid", "qvec", k = 5, nProbe = 6)
      .select("qid", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(wh.read("emb"), "vec_id",
        "embedding", queries, "qid", "qvec", k = 5)
      .select("qid", "rank", "id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(probed === brute)
    // REFIT: a rebuild reassigns the WHOLE corpus under fresh centroids
    // (an overwrite — no stale cells can linger) and resets the
    // baseline, so the ratio returns to exactly 1
    IndexStore.buildIvf(wh, "emb", "idx_ivf", "vec_id", "embedding",
      nCells = 6, fitFraction = 1.0, nParts = 4)
    val d3 = IndexStore.ivfDrift(wh, "idx_ivf").get
    assert(d3.ratio === 1.0 && !d3.needsRefit())
    assert(d3.buildMeanD2 !== d0.buildMeanD2) // new quantizer, new floor
    // and the reassignment is real: every row's cell matches a fresh
    // assignment under the new centroid table
    val cents2 = wh.read("idx_ivf_centroids")
    val wh3 = freshEmbWh()
    wh3.append("emb", wh.read("emb"))
    wh3.createTable("idx_ivf_centroids",
      Warehouse.TableSpec(cents2.schema), initial = Some(cents2))
    IndexStore.refreshIvf(wh3, "emb", "idx_ivf", "vec_id", "embedding",
      nParts = 4)
    assert(wh.read("idx_ivf_vectors").select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap ===
      wh3.read("idx_ivf_vectors").select("vec_id", "cell")
        .as[(Long, Int)].collect().toMap)
  }

  test("pq codebook round-trips through the warehouse exactly") {
    val wh = freshEmbWh()
    wh.append("emb", embs(0, 100))
    val cb = PQ.fitCodebook(wh.read("emb"), "embedding", m = 2, k = 4,
      fitFraction = 1.0)
    IndexStore.saveCodebook(wh, "idx_pq_book", cb)
    val loaded = IndexStore.loadCodebook(wh, "idx_pq_book")
    assert(loaded === cb)
    // ADC top-k under the loaded book == under the fresh book
    val queries = wh.read("emb").where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val fresh = PQ.topK(wh.read("emb"), "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, cb)
      .select("qid", "rank", "id", "adist")
      .as[(Long, Int, Long, Double)].collect().toSet
    val persisted = PQ.topK(wh.read("emb"), "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, loaded)
      .select("qid", "rank", "id", "adist")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(persisted === fresh)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, NearDup, PQ, Sampling, Similarity, TextFunctions}

/** Semantic checks for the training-data extension pack — especially the
  * properties the DuckDB gate can't express (MinHash recall, SimHash
  * locality, ANN behavior, codec determinism).
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river shore"), // near dup of 1
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "short doc"),
    (6L, "")).toDF("doc_id", "text")

  test("exact dedup keeps the first occurrence per normalized content") {
    val out = NearDup.exact(docs, "text", Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 3L, 4L, 5L, 6L)) // 2 deduped into 1
  }

  test("shingle guard: docs shorter than n tokens produce zero shingles") {
    val sh = docs.select(col("doc_id"),
      size(TextFunctions.shingles(col("text"), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sh(5L) === 0) // 2 tokens
    assert(sh(6L) === 0) // empty
    assert(sh(1L) > 0)
  }

  test("empty/blank docs have zero tokens, not one phantom token") {
    val n = Seq((1L, ""), (2L, "   "), (3L, "one two"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n(1L) === 0)
    assert(n(2L) === 0)
    assert(n(3L) === 2)
  }

  test("exact jaccard pairs find planted near-dups, no crossJoin in plan") {
    val pairs = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"crossJoin in plan:\n$plan")
    val got = pairs.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L))) // near dup
    assert(!got.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH recalls every exact pair at high jaccard") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = NearDup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // verification step makes LSH ⊆ exact; recall on j≥0.8 pairs should
    // be total at 16 bands × 4 rows (miss prob < 1e-6 at j=0.8)
    assert(lsh === exact)
  }

  test("simhash: identical docs share fingerprints, near-dups are close") {
    val sig = NearDup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L))
    val d13 = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val d14 = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(d13 < d14, s"near-dup hamming $d13 !< unrelated hamming $d14")
  }

  private lazy val vecs = {
    def v(seed: Int): Seq[Float] =
      (0 until 16).map(i => math.sin(seed * 31 + i).toFloat)
    Seq((0L, v(1)), (1L, v(1).updated(0, 9f)), (2L, v(2)), (3L, v(3)),
      (4L, v(1))).toDF("vec_id", "embedding")
  }

  test("brute-force top-k cosine ranks the identical vector first") {
    val q = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "qid", "qvec", 3).orderBy("rank")
      .select("id", "cosine").as[(Long, Double)].collect()
    assert(top.head._1 === 4L) // the exact copy (id 4) has cosine 1
    assert(math.abs(top.head._2 - 1.0) < 1e-9)
    assert(top.length === 3)
    assert(top.forall { case (_, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
  }

  test("ANN LSH candidates include the exact-copy neighbor") {
    val q = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = Similarity.annCandidates(vecs, "vec_id", "embedding",
      q, "qid", "qvec", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(cands.contains(4L)) // normalized distance 0
  }

  test("IVF top-k: probe-all is exact; partial probe keeps most recall") {
    val corpus = (0L until 60L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 13 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 5, nCells = 4, nProbe = 4)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(exact === brute) // probe-all ⇒ identical to brute force
    val partial = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 5, nCells = 4, nProbe = 2)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    // partial probe scores fewer candidates but must recover most of
    // the true top-k (self-cell + nearest neighbor cell)
    assert(partial.map(_._1).size === 3)
    assert((partial & brute).size >= brute.size / 2, s"$partial vs $brute")
  }

  test("IVF sampled quantizer fit: probe-all stays exact on any centroids") {
    val corpus = (0L until 60L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 13 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    // fitFraction 0.5 + low minFitRows forces the SAMPLE fit path (the
    // 100 TB shape: quantizer fits on a seeded subset, full corpus is
    // only assigned); probe-all must still equal brute force — the
    // recall-1 invariant holds for ANY quantizer
    val sampledFit = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 5, nCells = 4, nProbe = 4,
        fitFraction = 0.5, minFitRows = 8)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(sampledFit === brute)
  }

  test("cosine near-dup pairs find planted perturbed copies") {
    val corpus = (0L until 40L).map(i =>
      (i, (0 until 8).map(j => math.sin(i * 13 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val mutants = corpus.where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100L)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i === 0, (x + lit(0.001f)).cast("float")).otherwise(x)))
    val pairs = Similarity.cosineNearDupPairs(
        corpus.unionByName(mutants), "vec_id", "embedding", 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((i, i + 100L)), s"missing planted pair $i")
    }
  }

  test("semDeDup groups perturbed copies; non-dups stay singletons") {
    // one-hot base vectors: pairwise cosine EXACTLY 0 between distinct
    // docs, so only planted pairs can ever cluster (a sin-family corpus
    // has natural near-collisions that would pollute the expectation)
    val corpus = (0L until 10L).map(i =>
      (i, (0 until 16).map(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    // perturbed (not exact) copies of vecs 0..4: cosine ≈ 1 but the
    // vectors differ, so grouping must survive the quantizer's cell
    // assignment of two DISTINCT nearby points (nCells=2 keeps cells
    // coarse enough that a ~0.001-perturbation can't straddle)
    val mutants = corpus.where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100L)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i === 15, (x + lit(0.001f)).cast("float")).otherwise(x)))
    val out = Similarity.semDeDup(corpus.unionByName(mutants),
        "vec_id", "embedding", minCosine = 0.999, nCells = 2,
        fitFraction = 1.0)
      .select("vec_id", "cluster_id", "cluster_size", "is_kept")
      .as[(Long, Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length === 15)
    (0L until 5L).foreach { i =>
      assert(byId(i) === ((i, i, 2L, true)), s"canonical $i")
      assert(byId(i + 100L) === ((i + 100L, i, 2L, false)), s"dup of $i")
    }
    // everything else is its own singleton cluster, kept
    (5L until 10L).foreach { i =>
      assert(byId(i) === ((i, i, 1L, true)), s"singleton $i")
    }
    // exactly one kept doc per cluster
    assert(out.count(_._4) === 10)
  }

  test("semDeDup multi-probe catches boundary-straddling duplicates") {
    // two tight x-clusters pin the k=2 centroids at x ≈ ±1; a duplicate
    // PAIR rides the boundary between them at x = ±0.09, y = 0.9 — each
    // copy is EUCLIDEAN-nearest its own side's centroid (margin ≈ 0.28
    // in d², no tie for the quantizer to break), so the two copies
    // quantize into DIFFERENT cells and single-probe cannot see the
    // pair in one cell; nProbe=2 probes both cells and must recover it.
    // cosine(pair) ≈ 0.980; straddler↔anchor cosine ≈ 0.12, so no other
    // edge can merge them transitively.
    val anchors = (0 until 20).map { i =>
      val x = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq(x + (i % 5) * 0.01f, (i % 5) * 0.01f))
    }
    val straddle = Seq(
      (100L, Seq(0.09f, 0.9f)), (101L, Seq(-0.09f, 0.9f)))
    val corpus = (anchors ++ straddle).toDF("vec_id", "embedding")
    def clustersOf(nProbe: Int): Map[Long, Long] =
      Similarity.semDeDup(corpus, "vec_id", "embedding",
          minCosine = 0.975, nCells = 2, fitFraction = 1.0,
          nProbe = nProbe)
        .select("vec_id", "cluster_id")
        .as[(Long, Long)].collect().toMap
    val single = clustersOf(1)
    assert(single(100L) !== single(101L),
      "fixture broken: single-probe should miss the straddling pair")
    val multi = clustersOf(2)
    assert(multi(100L) === multi(101L),
      "nProbe=2 must join the boundary-straddling duplicates")
    // multi-probe adds edges, never removes: anchor clusters unchanged
    assert(multi.values.toSet.size === single.values.toSet.size - 1)
  }

  test("PQ: codes are in range, encode is pure, ADC recall beats floor") {
    // deterministic clustered corpus: 120 vectors, dim 16, 4 planted
    // centers with sin-jitter (no RNG — re-runs are bit-identical)
    val dim = 16
    val base = (0 until 120).map { i =>
      val c = i % 4
      (i.toLong, (0 until dim).map(j =>
        (c * 2.0 + 0.3 * math.sin(i * 7919.0 + j * 104729.0)).toFloat))
    }
    // 200 is an EXACT copy of 0: identical bytes ⇒ identical codes
    val corpus = (base :+ ((200L, base.head._2)))
      .toDF("vec_id", "embedding")
    val cb = PQ.fitCodebook(corpus, "embedding", m = 4, k = 8,
      fitFraction = 1.0)
    assert(cb.size === 4 && cb.forall(_.size === 8)
      && cb.forall(_.forall(_.size === 4)))
    val codes = corpus.select($"vec_id",
        PQ.encodeExpr($"embedding", cb).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.size == 4 && c.forall(x => x >= 0 && x < 8)))
    // identical vectors get identical codes (argmin determinism canary)
    assert(codes(0L) === codes(200L))
    // recall@10 of PQ-ADC vs EXACT euclidean top-10 for 6 queries
    val queries = corpus.where($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val approx = PQ.topK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, cb)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = corpus.crossJoin(broadcast(queries))
      .where($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        aggregate(zip_with($"embedding", $"qvec",
            (a, b) => (a.cast("double") - b.cast("double"))
              * (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy($"d2", $"vec_id")))
      .where($"rn" <= 10)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      approx(q).intersect(ex).size.toDouble / ex.size }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5,
      s"PQ recall@10 too low: $meanRecall (${recalls.toSeq.sorted})")
    // IVF-PQ composition: probe-all equals the plain ADC sweep exactly
    // (for ANY quantizer — same invariant as ivfTopK probe-all), and a
    // partial probe keeps most of the ADC ranking
    val bruteAdc = PQ.topK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, cb)
      .select($"qid", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    val probeAll = PQ.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, cb, nCells = 4, nProbe = 4,
        fitFraction = 1.0)
      .select($"qid", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    assert(probeAll === bruteAdc)
    val partial = PQ.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, cb, nCells = 4, nProbe = 2,
        fitFraction = 1.0)
      .select($"qid", $"rank", $"id").as[(Long, Int, Long)].collect().toSet
    assert((partial & bruteAdc).size >= bruteAdc.size / 2,
      s"partial-probe IVF-PQ lost too much: ${(partial & bruteAdc).size}" +
        s"/${bruteAdc.size}")
  }

  test("codec fallback decode is deterministic and batch-shaped") {
    val media = docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(lit("image").as("kind"), lit("x").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
    val f1 = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.decodeFeatures(media.repartition(3))
      .orderBy("media_id").collect()
    assert(f1.toSeq === f2.toSeq) // partitioning must not change results
    assert(f1.length === 6)
    val r1 = f1.head
    assert(r1.getAs[Int]("width") >= 64 && r1.getAs[Double]("mean_byte") > 0)
    // text bytes are not an image: every row takes the fallback path
    assert(f1.forall(!_.getAs[Boolean]("decoded")))
  }

  test("codec really decodes PNG payloads via javax.imageio") {
    // deterministic 2×2 PNG fixture, generated in-memory: one pixel per
    // grayscale level 0/85/170/255 → mean luma 127.5
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val levels = Seq(0, 85, 170, 255)
    for (i <- 0 until 4) {
      val v = levels(i)
      img.setRGB(i % 2, i / 2, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    // direct codec call
    val f = Multimodal.Codec.decode(png)
    assert(f.decoded, "PNG bytes must take the real imageio path")
    assert(f.width === 2 && f.height === 2)
    assert(math.abs(f.meanByte - 127.5) < 1e-9)

    // and through the distributed batch path
    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out(0).getAs[Boolean]("decoded") &&
      out(0).getAs[Int]("width") == 2 && out(0).getAs[Int]("height") == 2)
    assert(!out(1).getAs[Boolean]("decoded"))
  }

  test("audio codec really decodes WAV payloads via javax.sound") {
    // deterministic 100-frame 16-bit mono 8 kHz WAV, built in memory:
    // samples 0, ±1000 alternating → known mean |sample|
    val n = 100
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s: Short = if (i % 2 == 0) 1000 else -1000
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    val f = Multimodal.AudioCodec.decode(wav)
    assert(f.decoded, "WAV bytes must take the real javax.sound path")
    assert(f.sampleRate === 8000 && f.channels === 1 && f.frames === n.toLong)
    assert(math.abs(f.meanAbs - 1000.0) < 1e-9)

    // distributed path + fallback for non-audio bytes
    val media = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = Multimodal.decodeAudioFeatures(media)
      .orderBy("media_id").collect()
    assert(out(0).getAs[Boolean]("decoded") &&
      out(0).getAs[Long]("frames") == n.toLong)
    assert(!out(1).getAs[Boolean]("decoded"))
  }

  test("resize and frame sampling keep batch shape and determinism") {
    val media = docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(lit("video").as("kind"), lit("x").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
    val resized = Multimodal.resizeFeatures(media, 224, 224).collect()
    assert(resized.length === 6)
    assert(resized.forall(r =>
      r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))

    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() === 6 * 4) // row fanout: n frames per media row
    val f1 = frames.orderBy("media_id", "frame_idx").collect()
    val f2 = Multimodal.sampleFrames(media.repartition(3), 4)
      .orderBy("media_id", "frame_idx").collect()
    assert(f1.toSeq === f2.toSeq) // partitioning-independent
    // offsets are monotone within a media row
    val offs = f1.filter(_.getAs[Long]("media_id") == 1L)
      .map(_.getAs[Int]("offset"))
    assert(offs.toSeq === offs.toSeq.sorted)
  }

  test("language id: stopword votes with deterministic ties") {
    val out = Seq(
      (1L, "the cat of the house is here"),
      (2L, "der hund ist nicht das problem"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und")
  }

  test("deterministic sampling: rate, partition-independence, splits") {
    val ids = (0L until 2000L).toDF("id")
    // rate accuracy: binomial(2000, 0.5) stays within 5 sigma of mean
    val kept = Sampling.sample(ids, "id", 0.5, "s1").count()
    assert(math.abs(kept - 1000L) < 5 * math.sqrt(2000 * 0.25), kept)
    // membership is partitioning-independent (no RNG streams)
    val a = Sampling.sample(ids, "id", 0.3, "s2").as[Long].collect().toSet
    val b = Sampling.sample(ids.repartition(13), "id", 0.3, "s2")
      .as[Long].collect().toSet
    assert(a === b)
    // train/eval split: complement of the SAME draw, not a second draw
    val train = Sampling.sample(ids, "id", 0.9, "s3").as[Long].collect().toSet
    val eval_ = ids.where(
      Sampling.hashCoord(col("id"), "s3") >= lit(Sampling.hexCut(0.9)))
      .as[Long].collect().toSet
    assert((train & eval_).isEmpty && (train | eval_).size === 2000)
    // edge rates
    assert(Sampling.sample(ids, "id", 1.0, "s").count() === 2000)
    assert(Sampling.sample(ids, "id", 0.0, "s").count() === 0)
    // different salts are independent draws (overlap ≈ r², not r)
    val c1 = Sampling.sample(ids, "id", 0.5, "x").as[Long].collect().toSet
    val c2 = Sampling.sample(ids, "id", 0.5, "y").as[Long].collect().toSet
    val overlap = (c1 & c2).size.toDouble
    assert(math.abs(overlap - 500.0) < 5 * math.sqrt(2000 * 0.25 * 0.75), overlap)
  }

  test("stratified sampling: per-stratum rates, keep-all default") {
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "g")
    val out = Sampling.sampleBy(rows, "id", "g",
      Seq("a" -> 0.2, "b" -> 0.8), salt = "st")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 200.0) < 5 * math.sqrt(1000 * 0.2 * 0.8))
    assert(math.abs(counts("b") - 800.0) < 5 * math.sqrt(1000 * 0.2 * 0.8))
    assert(counts("c") === 1000) // undeclared stratum keeps everything
  }

  test("rebalance: binding stratum keeps all, others thin to the mixture") {
    // a: 2000 rows, b: 500, weights 1:1 → b binds (λ*=500), a thins to
    // ~500; undeclared c drops entirely
    val rows = (0L until 3000L).map { i =>
      val g = if (i < 2000) "a" else if (i < 2500) "b" else "c"
      (i, g)
    }.toDF("id", "g")
    val out = Sampling.rebalance(rows, "id", "g",
      Seq("a" -> 1.0, "b" -> 1.0), salt = "rb")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("b") === 500) // rate 1: every binding-stratum row kept
    assert(!counts.contains("c")) // weight 0 = dropped
    assert(math.abs(counts("a") - 500.0) < 5 * math.sqrt(2000 * 0.25 * 0.75))
    // pure function of (id, salt, counts): stable across partitionings
    val again = Sampling.rebalance(rows.repartition(17), "id", "g",
      Seq("a" -> 1.0, "b" -> 1.0), salt = "rb")
      .select("id").as[Long].collect().toSet
    assert(again === out.select("id").as[Long].collect().toSet)
  }

  test("prefix-filtered Jaccard equals the direct form exactly") {
    // boilerplate-heavy corpus: shared template prefix + tiny unique
    // tails — the skewed regime the prefix form targets — plus the
    // planted near-dup mutants
    val boiler = (0L until 60L).map(i =>
      (i, s"shared template header words repeated across all docs tail$i " +
        s"extra${i % 7} unique${i % 3}"))
      .toDF("doc_id", "text")
    for ((corpus, t) <- Seq((boiler, 0.45), (docs, 0.5))) {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), math.round(r.getDouble(5) * 1e9))
      val direct = NearDup.jaccardPairs(corpus, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      val prefixed = NearDup.jaccardPairsPrefix(corpus, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      assert(prefixed === direct)
      assert(direct.nonEmpty)
    }
  }

  test("salted Jaccard self-join is row-identical on a hot-shingle corpus") {
    // ~90% of postings are the shared template's shingles (hot in every
    // doc); tails keep real similarity structure. hotShingleFreq=10
    // forces the template shingles through the salted path while the
    // tails stay direct — both regimes active in one query.
    val hot = (0L until 80L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon " +
        s"tail${i % 4} end${i % 2}"))
      .toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), math.round(r.getDouble(5) * 1e9))
    for (t <- Seq(0.5, 0.9)) {
      val direct = NearDup.jaccardPairs(hot, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      val salted = NearDup.jaccardPairsSalted(hot, "doc_id", "text", 3, t,
          saltBuckets = 8, hotShingleFreq = 10)
        .collect().map(key).toSet
      assert(salted === direct)
      assert(direct.nonEmpty)
    }
    // no-hot corpus: everything takes the cold path, still identical
    val flat = NearDup.jaccardPairsSalted(docs, "doc_id", "text", 3, 0.5,
        saltBuckets = 8, hotShingleFreq = 64)
      .collect().map(key).toSet
    assert(flat === NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(key).toSet)
    // and the freq-cut composes with salting
    val cut = NearDup.jaccardPairsSalted(hot, "doc_id", "text", 3, 0.2,
        maxShingleFreq = 30, saltBuckets = 4, hotShingleFreq = 5)
      .collect().map(key).toSet
    assert(cut === NearDup.jaccardPairs(hot, "doc_id", "text", 3, 0.2,
      maxShingleFreq = 30).collect().map(key).toSet)
  }

  test("auto-regime Jaccard picks prefix on boilerplate, direct on flat") {
    val boiler = (0L until 60L).map(i =>
      (i, s"shared template header words repeated across all docs tail$i " +
        s"extra${i % 7} unique${i % 3}"))
      .toDF("doc_id", "text")
    // the sketch statistic separates the shapes by a wide margin
    val skewBoiler = NearDup.shingleSkew(boiler, "doc_id", "text", 3)
    val skewFlat = NearDup.shingleSkew(docs, "doc_id", "text", 3)
    assert(skewBoiler > 8.0, s"boilerplate skew $skewBoiler")
    assert(skewFlat < 8.0, s"flat skew $skewFlat")
    // a deterministic sample reads the same regime (heavy hitters survive)
    assert(NearDup.shingleSkew(boiler, "doc_id", "text", 3,
      sampleFraction = 0.5) > 8.0)
    // and the auto form returns the same pairs as both fixed forms
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), math.round(r.getDouble(5) * 1e9))
    for ((corpus, t) <- Seq((boiler, 0.45), (docs, 0.5))) {
      val auto = NearDup.jaccardPairsAuto(corpus, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      val direct = NearDup.jaccardPairs(corpus, "doc_id", "text", 3, t)
        .collect().map(key).toSet
      assert(auto === direct)
      assert(auto.nonEmpty)
    }
  }

  test("vocab induce+encode: ids by rank, OOV 0, order kept, total over docs") {
    import graft.ext.Vocab
    val d = Seq(
      (1L, "b a b c b a"),   // b:3 a:2 c:1 (+ d below)
      (2L, "a d b"),
      (3L, "")).toDF("doc_id", "text")
    val vocab = Vocab.induce(d, "text", 3)
      .select("token", "id").as[(String, Int)].collect().toMap
    // counts: b=4, a=3, c=1, d=1 → top-3 with tie (c,d) broken by token
    assert(vocab === Map("b" -> 1, "a" -> 2, "c" -> 3))
    val out = Vocab.encode(d, "doc_id", "text", Vocab.induce(d, "text", 3))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 6L, 0L, "1,2,1,3,1,2")))
    assert(out(1) === ((2L, 3L, 1L, "2,0,1"))) // d is OOV → 0, order kept
    assert(out(2) === ((3L, 0L, 0L, "")))      // empty doc still encoded
  }

  test("crossDocSpans counts documents, not occurrences") {
    val d = Seq(
      (1L, "a b c d a b c d"), // span "a b c" twice WITHIN one doc
      (2L, "x a b c d y"),
      (3L, "nothing shared here at all now")).toDF("doc_id", "text")
    // within-doc repetition must not inflate df: "a b c" df=2 (docs 1,2)
    val rows = NearDup.crossDocSpans(d, "doc_id", "text", 3, 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows("a b c") === ((2L, 1L, 2L)))
    assert(rows("b c d") === ((2L, 1L, 2L)))
    assert(!rows.contains("c d a")) // only in doc 1
  }

  test("int8 quantization: zero guard, bounds, dequantized top-k recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (scale, q) = Similarity.quantizeInt8(col("embedding"))
    val quant = emb.select(col("vec_id"), scale.as("s"), q.as("q"))
    // all components within int8 range
    val outOfRange = quant
      .where(exists(col("q"), v => v > 127 || v < -127)).count()
    assert(outOfRange === 0)
    // zero vector quantizes to zeros, not NaN garbage
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(Similarity.quantizeInt8(col("embedding"))._2.as("q"))
      .as[Seq[Int]].head()
    assert(z === Seq(0, 0, 0))
    // top-k over DEQUANTIZED vectors keeps most of the true neighbors
    val deq = emb.select(col("vec_id"),
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("embedding"))._1,
        Similarity.quantizeInt8(col("embedding"))._2).as("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def topk(c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(c, "vec_id", "embedding", queries, "qid", "qvec", k = 5)
        .select("qid", "id").as[(Long, Long)].collect().toSet
    val exact = topk(emb)
    val approx = topk(deq)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"dequantized recall $recall")
  }

  test("sequence packing: offsets contiguous, chunk math consistent") {
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 500L), (3L, "en", 0L), (4L, "en", 600L),
      (5L, "de", 512L), (6L, "de", 1L)
    ).toDF("doc_id", "lang", "n")
    val out = graft.ext.Packing
      .packAssignments(docs, "doc_id", "lang", col("n"), budget = 512)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // en stream: starts 0, 100, 600, 600
    assert(byId(1L) === ((1L, "en", 100L, 0L, 0L, 0L, 0L)))
    assert(byId(2L) === ((2L, "en", 500L, 100L, 0L, 100L, 1L))) // straddles
    assert(byId(3L) === ((3L, "en", 0L, 600L, 1L, 88L, 0L)))    // empty doc
    assert(byId(4L) === ((4L, "en", 600L, 600L, 1L, 88L, 1L)))
    // de stream packs independently; 512 tokens fill seq 0 exactly
    assert(byId(5L) === ((5L, "de", 512L, 0L, 0L, 0L, 0L)))
    assert(byId(6L) === ((6L, "de", 1L, 512L, 1L, 0L, 0L)))
    // invariants on the real corpus: offset within budget, starts are
    // the running sum (contiguous concat)
    val real = graft.ext.Packing.packAssignments(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "lang",
      graft.ext.TextFunctions.tokenCount(col("text")), budget = 512)
    assert(real.where(col("offset_in_seq") < 0 ||
      col("offset_in_seq") >= 512).count() === 0)
    val bad = real.withColumn("next_start",
        lead(col("start_offset"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy("doc_id")))
      .where(col("next_start").isNotNull &&
        col("next_start") =!= col("start_offset") + col("n_tokens"))
    assert(bad.count() === 0)
  }

  test("clusters: paths, cycles, isolated vertices, min-label canon") {
    // components: a 6-path (10..15, diameter 5 — exercises multi-round
    // propagation + pointer jumping), a triangle with an extra chord
    // (20,21,22), an isolated vertex (30), and a 2-cycle duplicate edge
    val ids = (Seq(30L) ++ (10L to 15L) ++ (20L to 22L)).toDF("id")
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), // path
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 20L)              // cycle
    ).toDF("id1", "id2")
    val got = NearDup.clusters(ids, "id", pairs)
      .as[(Long, Long)].collect().toMap
    (10L to 15L).foreach(v => assert(got(v) === 10L, s"path vertex $v"))
    (20L to 22L).foreach(v => assert(got(v) === 20L, s"cycle vertex $v"))
    assert(got(30L) === 30L) // singleton keeps itself
    assert(got.size === 10)
    // edges may reference vertices OUTSIDE ids: they conduct
    // connectivity (40-50-41 joins 40 and 41 through excluded 50) and
    // are filtered from the output
    val sliced = NearDup.clusters(
      Seq(40L, 41L).toDF("id"), "id",
      Seq((40L, 50L), (50L, 41L)).toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(sliced === Map(40L -> 40L, 41L -> 40L))
  }

  test("clusters: keep-one-per-cluster contracts the planted chain corpus") {
    // orig -- mutant -- mutant2 chains from the q54 corpus shape: after
    // clustering, exactly one canonical doc per component survives.
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (1000001L, "aa bb cc dd ee ff gg hh ii jj zq zq"),
      (2000001L, "aa bb cc dd ee ff gg hh ii jj zq zq zq zq"),
      (2L, "completely different words entirely here now ok yes no maybe")
    ).toDF("doc_id", "text")
    val pairs = NearDup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.6)
    val comp = NearDup.clusters(docs.select("doc_id"), "doc_id", pairs)
    val kept = comp.where(col("doc_id") === col("cluster_id"))
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(kept === Set(1L, 2L))
  }

  // Sequential reference BPE (Sennrich 2016) — the ground truth the
  // distributed trainer must reproduce exactly, same tie-break.
  private def refBpe(words: Map[String, Long],
      nMerges: Int): (Seq[(String, String)], Map[String, List[String]]) = {
    var segs: Map[String, (List[String], Long)] = words.map { case (w, c) =>
      val syms = w.toList.map(_.toString) match {
        case init :+ last => init :+ (last + "</w>")
        case Nil => Nil
      }
      w -> (syms, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def applyRef(s: List[String], l: String, r: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    while (merges.size < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.values.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) return (merges.toSeq, segs.map { case (w, (s, _)) => w -> s })
      val (l, r) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
      merges += ((l, r))
      segs = segs.map { case (w, (s, c)) => w -> (applyRef(s, l, r), c) }
    }
    (merges.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  test("bpeMerges reproduces the sequential reference trainer exactly, " +
      "bpeSegment matches its segmentations") {
    // the classic BPE teaching corpus, as documents with repeated words
    val freqs = Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L)
    val corpus = freqs.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = graft.ext.Vocab.bpeMerges(corpus, "text", nMerges = 6)
      .orderBy("rank")
      .select($"left", $"right").as[(String, String)].collect().toSeq
    val (want, wantSegs) = refBpe(freqs, 6)
    assert(got === want)
    // deployment: per-word segmentation under the learned merges
    val segged = freqs.keys.toSeq.sorted.toDF("word")
      .select($"word",
        graft.ext.Vocab.bpeSegment($"word", got).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    freqs.keys.foreach { w =>
      assert(segged(w) === wantSegs(w), s"word $w")
    }
    // merged symbols reassemble the word (+ end marker): lossless
    freqs.keys.foreach { w =>
      assert(segged(w).mkString === w + "</w>")
    }
  }

  test("bpeMerges stops early when no adjacent pairs remain") {
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // [a, b</w>] fully merges in ONE step; asking for 10 yields just it
    val m = graft.ext.Vocab.bpeMerges(tiny, "text", nMerges = 10)
    assert(m.count() === 1L)
    val segs = Seq("ab").toDF("word")
      .select(graft.ext.Vocab.bpeSegment($"word",
        m.orderBy("rank").select($"left", $"right")
          .as[(String, String)].collect().toSeq).as("s"))
      .as[Seq[String]].head()
    assert(segs === Seq("ab</w>"))
  }

  test("hardNegatives excludes same-label neighbors, keeps the " +
      "closest cross-label ones in rank order") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f), 0),  // same label as query — excluded
      (2L, Seq(0.9f, 0.1f), 1),  // closest cross-label → rank 1
      (3L, Seq(0.0f, 1.0f), 1),  // near-orthogonal → rank 2
      (10L, Seq(1.0f, 0.05f), 0) // the query itself (self-excluded)
    ).toDF("vec_id", "embedding", "label")
    val qs = corpus.where($"vec_id" === 10L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_lab"))
    val got = Similarity.hardNegatives(corpus, "vec_id", "embedding",
        "label", qs, "q_id", "q_vec", "q_lab", kCand = 10, kNeg = 5)
      .select($"id", $"neg_rank").as[(Long, Long)]
      .collect().toList.sortBy(_._2)
    assert(got === List((2L, 1L), (3L, 2L)))
    // kNeg cuts after the cross-label re-rank
    val one = Similarity.hardNegatives(corpus, "vec_id", "embedding",
        "label", qs, "q_id", "q_vec", "q_lab", kCand = 10, kNeg = 1)
      .select($"id").as[Long].collect().toList
    assert(one === List(2L))
  }

  test("keepBest keeps the argmax-score member per cluster, not first") {
    // 1 ↔ 2 near-dup; 2 carries the higher score → 2 kept, 1 dropped;
    // 4 is a singleton cluster and always survives
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the bank", 0.3),
      (2L, "the quick brown fox jumps over the lazy dog near the shore", 0.9),
      (4L, "completely different content about spark engines here", 0.1)
    ).toDF("doc_id", "text", "score")
    val pairs = NearDup.jaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.6)
    assert(pairs.count() === 1L) // sanity: 1↔2 is the only edge
    val out = NearDup.keepBest(corpus, "doc_id", pairs, col("score"))
      .select($"doc_id", $"cluster_id", $"cluster_size", $"is_kept")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out === Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (4L, 4L, 1L, true)))
  }

  test("keepBest breaks score ties toward the smaller id") {
    val corpus = Seq(
      (7L, "alpha beta gamma delta epsilon zeta eta theta", 0.5),
      (9L, "alpha beta gamma delta epsilon zeta eta theta", 0.5)
    ).toDF("doc_id", "text", "score")
    val pairs = NearDup.jaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.6)
    val kept = NearDup.keepBest(corpus, "doc_id", pairs, col("score"))
      .where($"is_kept").select($"doc_id").as[Long].collect().toList
    assert(kept === List(7L))
  }

  test("capPerKey: cap binds per key, ranks are 1..cap, " +
      "membership survives repartitioning") {
    val rows = (1L to 20L).map(i => (i, if (i <= 12) "big" else "small"))
      .toDF("id", "key")
    val out = Sampling.capPerKey(rows, "id", "key", cap = 5, salt = "t")
      .select($"id", $"key", $"key_rank").as[(Long, String, Long)]
      .collect().toList
    assert(out.count(_._2 == "big") === 5)   // 12 rows capped to 5
    assert(out.count(_._2 == "small") === 5) // 8 rows capped to 5
    assert(out.groupBy(_._2).forall { case (_, g) =>
      g.map(_._3).sorted == (1L to g.size).toList })
    // pure function of (id, salt): identical kept set on any layout
    val re = Sampling.capPerKey(rows.repartition(13, $"id"),
        "id", "key", cap = 5, salt = "t")
      .select($"id").as[Long].collect().toSet
    assert(re === out.map(_._1).toSet)
  }

  test("capPerKey keeps whole groups smaller than the cap") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val out = Sampling.capPerKey(rows, "id", "key", cap = 10)
      .select($"id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("editDistancePairs: all three edit kinds found, distance 2 not") {
    val keys = Seq(
      (1L, "kitten"),   // vs 2: substitution (1)
      (2L, "mitten"),
      (3L, "kitte"),    // vs 1: deletion (1); vs 2: distance 2
      (4L, "kittens"),  // vs 1: insertion (1); vs 3: distance 2
      (5L, "kitten"),   // vs 1: equal (0)
      (6L, "dog"),      // isolated
      (7L, null.asInstanceOf[String]),
      (8L, "")          // excluded (empty)
    ).toDF("id", "key")
    val got = NearDup.editDistancePairs(keys, "id", "key")
      .select($"id1", $"id2", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(got === Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 0),
      (2L, 5L, 1), (3L, 5L, 1), (4L, 5L, 1)))
  }

  test("scrubRepeatedSpans: non-first occurrences lose covered tokens") {
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5 tail1 tail2"), // first occurrence — intact
      (2L, "a1 a2 a3 a4 a5 uniq1 uniq2"), // repeats doc 1's 5-span
      (3L, "a1 a2 a3 a4 a5"),             // exact span only → scrubs empty
      (4L, "b1 b2 b3 b4 b5 b6 b7"),       // unique — intact
      (5L, "")                            // empty — stays empty
    ).toDF("doc_id", "text")
    val out = graft.ext.NearDup
      .scrubRepeatedSpans(corpus, "doc_id", "text", n = 5)
      .select($"doc_id", $"n_tokens", $"n_kept", $"text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 7L, 7L, "a1 a2 a3 a4 a5 tail1 tail2")))
    assert(out(2L) === ((2L, 7L, 2L, "uniq1 uniq2")))
    assert(out(3L) === ((3L, 5L, 0L, "")))
    assert(out(4L) === ((4L, 7L, 7L, "b1 b2 b3 b4 b5 b6 b7")))
    assert(out(5L) === ((5L, 0L, 0L, "")))
  }

  test("scrubRepeatedSpans: overlapping dup occurrences remove the union") {
    // doc 2 contains doc 1's span twice, overlapping itself at 'a1':
    // occurrences at offsets 0 and 3 of "a1 a2 a3 a1 a2 a3" (n=3)
    val corpus = Seq(
      (1L, "a1 a2 a3"),
      (2L, "a1 a2 a3 a1 a2 a3 t1")
    ).toDF("doc_id", "text")
    val out = graft.ext.NearDup
      .scrubRepeatedSpans(corpus, "doc_id", "text", n = 3)
      .select($"doc_id", $"n_kept", $"text_clean")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, "a1 a2 a3")))
    // every token of doc 2 covered by SOME non-first occurrence except t1
    assert(out(2L) === ((2L, 1L, "t1")))
  }

  test("dsir: target-like docs get higher importance weight and the " +
    "gumbel draw is deterministic") {
    import graft.ext.Dsir
    // two clearly-separated token distributions
    val zhish = (0 until 30).map(i =>
      (i.toLong, "zh", s"za zb zc zd z$i za zb"))
    val enish = (30 until 60).map(i =>
      (i.toLong, "en", s"ea eb ec ed e$i ea eb"))
    val raw = (zhish ++ enish).toDF("doc_id", "lang", "text")
    val target = raw.where($"lang" === "zh")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .join(raw.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg($"log_weight").as("mw"))
      .as[(String, Double)].collect().toMap
    assert(w("zh") > w("en") + 1.0,
      s"target-like docs must score clearly higher: $w")
    val draw = Dsir.resample(raw, target, "doc_id", "text", k = 20)
    val ids = draw.select("doc_id").as[Long].collect().toSet
    // weighted draw: the zh half should dominate the selected 20
    val nZh = ids.count(_ < 30)
    assert(nZh >= 15, s"expected zh-heavy sample, got $nZh/20 zh")
    // pure function of (corpus, salt): a second run draws identically
    val ids2 = Dsir.resample(raw, target, "doc_id", "text", k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === ids2)
    // a different salt redraws the noise (weights unchanged)
    val ids3 = Dsir.resample(raw, target, "doc_id", "text", k = 20,
      salt = "other").select("doc_id").as[Long].collect().toSet
    assert(ids3 !== ids)
  }

  test("gopher rules: per-rule flags, conjunctive keep, first-fail order") {
    import graft.ext.QualityRules
    def filler(n: Int) = (1 to n).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, s"the a ${filler(48)}"),                 // all rules pass
      (2L, "the a short doc"),                      // fails word_count first
      (3L, s"xx ${filler(49)}"),                    // fails stopword_hits only
      (4L, ("the a " + (1 to 48).map(_ => "hyperlongtokenxyz").mkString(" ")))
                                                    // fails mean_word_length
    ).toDF("doc_id", "text")
    val out = QualityRules.evaluate(corpus, "text",
        QualityRules.gopher(col("text")))
      .select($"doc_id", $"keep", $"first_fail")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, true, null)))
    assert(out(2L) === ((2L, false, "word_count")))
    assert(out(3L) === ((3L, false, "stopword_hits")))
    assert(out(4L) === ((4L, false, "mean_word_length")))
    val report = QualityRules.killReport(
        QualityRules.evaluate(corpus, "text", QualityRules.gopher(col("text"))))
      .as[(String, Long)].collect().toMap
    assert(report === Map("(kept)" -> 1L, "word_count" -> 1L,
      "stopword_hits" -> 1L, "mean_word_length" -> 1L))
  }

  test("temperature sampling: binding stratum keeps all, shares follow n^alpha") {
    val pool = (0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))
    val df = pool.toDF("id", "lang")
    val kept = Sampling.temperature(df, "id", "lang", alpha = 0.5)
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // λ* binds at the smallest stratum: small keeps all 100;
    // big keeps ≈ sqrt(900/100)·100 = 300 (hash-threshold binomial noise)
    assert(kept("small") === 100L)
    assert(kept("big") > 240L && kept("big") < 360L, kept.toString)
    // pure function of (id, salt, counts): re-run identical
    val again = Sampling.temperature(df, "id", "lang", alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(Sampling.temperature(df, "id", "lang", alpha = 0.5)
      .select("id").as[Long].collect().toSet === again)
  }

  test("fuzzy decontamination: extended benchmark doc flags its source") {
    import graft.ext.Decontam
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")).toDF("doc_id", "text")
    // bench 7 extends doc 1 (paraphrase-ish: high but < 1 Jaccard);
    // bench 8 is unrelated
    val bench = Seq(
      (7L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 tail tail"),
      (8L, "y1 y2 y3 y4 y5")).toDF("bid", "btext")
    val got = Decontam.fuzzyContaminated(corpus, "doc_id", "text",
        bench, "bid", "btext", n = 3, minJaccard = 0.5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: common 3-grams = 8, doc has 8, bench has 10 → J = 0.8
    assert(got.keySet === Set(1L))
    assert(got(1L)._2 === 1L && got(1L)._3 === 7L)
    assert(math.abs(got(1L)._4 - 0.8) < 1e-9)
  }

  test("chunkOverlap: tail coverage, no subset chunks, empty-doc zero") {
    import graft.ext.Packing
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                  // shorter than chunk
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Packing.chunkOverlap(docs, "doc_id", "text",
        chunk = 8, stride = 4)
      .select($"doc_id", $"chunk_idx", $"chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    // n=10, c=8, s=4 → 1 + ceil(2/4) = 2 chunks: [1..8], [5..10]
    assert(got === Set(
      (1L, 0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1L, 6L, (5 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 0L, 3L, "a b c")))
    // stride == chunk: disjoint cover
    val disjoint = Packing.chunkOverlap(docs.where($"doc_id" === 1),
        "doc_id", "text", chunk = 4, stride = 4)
      .select($"chunk_text").as[String].collect().toSet
    assert(disjoint === Set("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
  }

  test("proximity: window cut on the closest pair, per-doc only") {
    import graft.ext.Retrieval
    val docs = Seq(
      (1L, "spark x x x query tail"),     // dist 4 → in window 5
      (2L, "spark x x x x x x query"),    // dist 7 → out
      (3L, "query y spark y query"),      // closest pair dist 2
      (4L, "spark only here"),            // missing one term
      (5L, "query only here")
    ).toDF("doc_id", "text")
    val got = Retrieval.proximity(docs, "doc_id", "text",
        "spark", "query", window = 5)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 3L))
    assert(got(1L) === ((1L, 1L, 1L, 4L)))
    assert(got(3L) === ((3L, 1L, 2L, 2L)))
  }

  test("dsir: empty docs stay in the pool at weight zero") {
    import graft.ext.Dsir
    val raw = Seq((1L, "aa bb cc"), (2L, ""), (3L, "aa bb dd"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, raw.where($"doc_id" === 1), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(w(2L) === ((2L, 0L, 0.0)))
    assert(w.size === 3)
  }
}

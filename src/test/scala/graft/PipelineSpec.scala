package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Sessionize}

class PipelineSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("exactDedup groups identical texts and keeps the min id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (7L, "x y"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val r = Dedup.exactDedup(docs).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(r === Set((1L, 3L), (7L, 1L)))
  }

  test("normalizedDedup collapses case/punctuation/whitespace variants exactDedup keeps apart") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"))
      .toDF("doc_id", "text")
    // byte-exact dedup sees four distinct texts
    assert(Dedup.exactDedup(docs).count() === 4)
    val r = Dedup.normalizedDedup(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(r === Set((1L, 3L), (4L, 1L))) // 1,2,3 collapse; keep id 1
  }

  test("semanticDedupRemovals drops within-cell near-dups, keeps lowest id") {
    // ids 0 and 10 are centroid samples (stride (12+4)/4 = 4 -> ids 0,4,8,12);
    // near-identical vectors land in the same cell and the higher id is removed
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f)),
      (8L, Array(0f, 0f, 1f)),
      (12L, Array(-1f, -1f, 0f)),
      (5L, Array(0.01f, 0.99f, 0f)),  // near-dup of 4 (same cell)
      (6L, Array(0.02f, 0.98f, 0f)))  // near-dup of 4 and 5
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticDedupRemovals(vecs, numCells = 4, threshold = 0.95)
      .orderBy("removed_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toList
    // 5 removed against kept 4; 6 removed against its smallest qualifying twin 4
    assert(r === List((5L, 4L), (6L, 4L)))
    // below-threshold corpus: nothing removed
    assert(Dedup.semanticDedupRemovals(vecs.filter(col("vec_id") % 4 === 0),
      numCells = 4, threshold = 0.95).count() === 0)
  }

  test("streamSemanticDedup screens incoming rows against the static corpus cells") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup_stream_test_")
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f)),
      (8L, Array(0f, 0f, 1f)),
      (12L, Array(-1f, -1f, 0f)),
      (5L, Array(0.01f, 0.99f, 0f)),
      (6L, Array(0.02f, 0.98f, 0f)))
      .toDF("vec_id", "embedding")
    val pq = dir.resolve("emb.parquet").toString
    vecs.coalesce(1).write.mode("overwrite").parquet(pq)
    val part = new java.io.File(pq).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val r = graft.streaming.StreamingOps.streamSemanticDedup(
      spark, part, vecs.filter(col("vec_id") <= 4),
      streamPred = col("vec_id") >= 5, numCells = 2, threshold = 0.95,
      statePartitions = 2)
      .orderBy("new_id").select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toList
    // centroids from static {0,4}: stride (4+2)/2=3 -> ids {0}? 0%3=0 only
    // -> all static in cell 0; stream 5,6 assign to cell 0; only 4 is
    // cosine>=0.95 to them
    assert(r === List((5L, 4L), (6L, 4L)))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("audioResample: identity ratio is lossless, 2:1 decimates, 4:3 interpolates") {
    import graft.operators.{Multimodal, WavCodec}
    val xs = Array[Short](0, 300, -600, 900, -1200, 150, 0, 30)
    val payload = Seq((1L, WavCodec.encode(8000, xs))).toDF("doc_id", "payload")
    // identity: every sample back, exactly
    val id = Multimodal.audioResample(payload, outRate = 8000)
      .orderBy("out_idx").select("value").as[Double].collect()
    assert(id.toList === xs.map(_.toDouble).toList)
    // 2:1 decimation: every other sample (r always 0)
    val half = Multimodal.audioResample(payload, outRate = 4000)
      .orderBy("out_idx").select("value").as[Double].collect()
    assert(half.toList === List(0.0, -600.0, -1200.0, 0.0))
    // 4:3: output 5 lands between sources — ((3-r)*x[i] + r*x[i+1])/3
    val up = Multimodal.audioResample(payload, outRate = 6000)
      .orderBy("out_idx").select("out_idx", "n_out", "value")
      .as[(Int, Int, Double)].collect()
    assert(up.head._2 === 6) // (8-1)*3/4 + 1
    // j=1: p=4/3 -> i=1, r=1: (2*300 + 1*(-600))/3 = 0
    assert(up(1)._3 === 0.0)
    // j=2: p=8/3 -> i=2, r=2: (1*(-600) + 2*900)/3 = 400
    assert(up(2)._3 === 400.0)
  }

  test("ngramJaccardPairs finds near-identical docs and skips unrelated ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),          // near-dup of 1
      (3L, "completely different words with no shared trigrams at all ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("fuzzyPrefixPairs finds edit-distance near-matches Jaccard scores low") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    // one transposition + one substitution inside the 48-char prefix
    val b = "the quick brwon fox jumps over the lazy dog near the river bank today"
    val c = "entirely different content with no overlap whatsoever in any shingle"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val r = Dedup.fuzzyPrefixPairs(docs, n = 3, prefixLen = 48, maxDist = 4)
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Int)].collect().toList
    assert(r === List((1L, 2L, 2))) // "brown" -> "brwon" = 2 unit edits
    // tight threshold excludes the pair
    assert(Dedup.fuzzyPrefixPairs(docs, n = 3, prefixLen = 48, maxDist = 1).count() === 0)
  }

  test("containmentPairs catches a quoted subset that Jaccard misses") {
    val quote = "to be or not to be that is the question"
    val long = "the long essay begins here " + quote +
      " and then continues with many entirely unrelated words about " +
      "weather mountains rivers travel cooking music history and art"
    val docs = Seq((1L, quote), (2L, long),
      (3L, "nothing shared with either of the other two documents at all"))
      .toDF("doc_id", "text")
    // the short doc's trigrams are all inside the long doc -> containment 1.0
    val cont = Dedup.containmentPairs(docs, n = 3, threshold = 0.9)
      .select("inner_id", "outer_id").as[(Long, Long)].collect().toSet
    assert(cont === Set((1L, 2L))) // directed: quote ⊂ essay, not vice versa
    // symmetric Jaccard misses the same pair at any comparable threshold
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jac === Set.empty)
  }

  test("repeatedSpans extracts planted shared passages and merges overlapping seeds") {
    // docs 1 and 2 share an 8-token passage embedded at different
    // offsets inside otherwise-unique text; doc 3 is all-unique
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (1L, s"u1 u2 u3 $passage v1 v2"),           // passage at tokens 3..10
      (2L, s"w1 $passage x1 x2 x3 x4"),           // passage at tokens 1..8
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11")) // no repeats
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, n = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // five overlapping 4-gram seeds per doc merge into ONE maximal span
    // covering exactly the 8 planted tokens
    assert(spans === Set((1L, 3, 10, 8), (2L, 1, 8, 8)))
  }

  test("repeatedSpans honors minDocs: a passage repeated within ONE doc only is not cross-doc") {
    val docs = Seq(
      (1L, "a b c d a b c d"), // internal repeat only
      (2L, "e f g h i j k l"))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, n = 4, minDocs = 2).count() == 0)
  }

  test("embeddingNearDupPairs: block count never changes the result (pair coverage is exact)") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 60)
    def pairs(b: Int): Set[(Long, Long, Double)] =
      Dedup.embeddingNearDupPairs(emb, threshold = 0.3, blocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = pairs(1)
    assert(ref.nonEmpty, "fixture should contain near-dup pairs at 0.3")
    for (b <- Seq(2, 5, 8, 64)) assert(pairs(b) == ref, s"blocks=$b diverged")
  }

  test("contaminationPairs counts shared distinct n-grams across the split") {
    // train docs 1 and 2 both contain the eval doc 10's 5-token passage;
    // doc 2 repeats it (distinct grams counted once); doc 3 shares nothing
    val passage = "alpha beta gamma delta epsilon"
    val train = Seq(
      (1L, s"intro words here $passage closing words"),
      (2L, s"$passage and then once more $passage"),
      (3L, "totally unrelated content with zero overlap at all"))
      .toDF("doc_id", "text")
    val evalSet = Seq((10L, s"benchmark prompt $passage answer")).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(train, evalSet, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shared 5-grams = every window of the passage plus its overlaps with
    // surrounding eval tokens only if those tokens also appear in train —
    // they don't, so exactly the one in-passage 5-gram is shared
    assert(got === Set((1L, 10L, 1L), (2L, 10L, 1L)))
  }

  test("bm25 matches the closed-form score on a hand-checked corpus") {
    val docs = Seq(
      (1L, "data data data pad pad pad"), // tf(data)=3, dl=6
      (2L, "data pad"),                   // tf(data)=1, dl=2
      (3L, "pad pad pad pad"))            // tf(data)=0, dl=4
      .toDF("doc_id", "text")
    val got = graft.operators.Bm25.score(docs, Seq("data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // N=3, df=2, avgdl=4; idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      idf * ((tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * (dl / 4.0))))
    assert(math.abs(got(1L) - s(3, 6)) < 1e-12)
    assert(math.abs(got(2L) - s(1, 2)) < 1e-12)
    assert(got(3L) === 0.0)
    assert(got(1L) > got(2L), "higher tf must outrank at comparable length")
  }

  test("minHash LSH candidates include exact duplicates") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatePairs(docs, n = 3, numHashes = 6, bandSize = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simHash: identical texts share fingerprints, disjoint texts differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content goes right here"))
      .toDF("doc_id", "text")
    val fp = Dedup.simHash(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("sessionize splits on gaps > threshold and aggregates correctly") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 1.0), (1L, 3L, ts(70), 1.0),
      (2L, 4L, ts(5), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val sessions = Sessionize.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Int, Long)].collect()
    assert(sessions.toSeq === Seq((1L, 0, 2L), (1L, 1, 1L), (2L, 0, 1L)))
  }

  test("ngramJaccardPairs df-cap: no-op above max df, prunes below") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, 3)
    val uncapped = Dedup.ngramJaccardPairsFromShingles(sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cappedHigh = Dedup.ngramJaccardPairsFromShingles(sh, 0.8, maxShingleDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cappedHigh === uncapped)
    assert(uncapped === Set((1L, 2L)))
    // cap of 1 drops every shared shingle -> no pairs survive
    val capped1 = Dedup.ngramJaccardPairsFromShingles(sh, 0.8, maxShingleDf = 1)
      .collect()
    assert(capped1.isEmpty)
  }

  test("sessionize orders fractional-second events correctly (sort-key regression)") {
    // 1.6s and 2.0s: the old key getTime*1000 + nanos/1000 double-counted
    // the sub-second part (1.6s -> 2,200,000 us), ordering the earlier
    // event AFTER the later one — visible as start_ts > end_ts
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val events = Seq(
      (1L, 1L, ts(1600), 1.0), (1L, 2L, ts(2000), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val s = Sessionize.sessionize(events, gapMinutes = 30)
      .select("start_ts", "end_ts").as[(Timestamp, Timestamp)].head()
    assert(s._1 === ts(1600))
    assert(s._2 === ts(2000))
  }

  test("multimodal features go through the real decoder, not the raw payload") {
    val docs = Seq((7L, "ignored")).toDF("doc_id", "text")
    val f = Multimodal.extractImageFeatures(
      Multimodal.syntheticImages(docs, w = 8, h = 6)).head
    assert(f.getInt(1) === 8 && f.getInt(2) === 6)
    assert(f.getLong(3) === 11L + 144L) // "P6\n8 6\n255\n" header + pixels
    // recompute the decoded-pixel digest locally from the pixel formula
    val rgb = new Array[Byte](48 * 3)
    for (p <- 0 until 48) {
      rgb(p * 3) = ((7L * 31 + p) % 256).toByte
      rgb(p * 3 + 1) = ((7L * 17 + 2L * p + 5) % 256).toByte
      rgb(p * 3 + 2) = ((7L * 13 + 3L * p + 11) % 256).toByte
    }
    val hex = rgb.map("%02x".format(_)).mkString
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hex.getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(f.getString(4) === expect)
  }

  test("resize fingerprint: identity resize reproduces the original pixel digest") {
    val docs = Seq((3L, "ignored")).toDF("doc_id", "text")
    val images = Multimodal.syntheticImages(docs, w = 8, h = 6)
    val same = Multimodal.resizeFingerprint(images, outW = 8, outH = 6).head
    val orig = Multimodal.extractImageFeatures(images).head
    assert(same.getString(5) === orig.getString(4))
    val thumb = Multimodal.resizeFingerprint(images, outW = 4, outH = 3).head
    assert(thumb.getInt(3) === 4 && thumb.getInt(4) === 3)
    assert(thumb.getString(5) !== orig.getString(4))
  }

  test("as-of join: equal-ts inclusion, latest-wins, null when no prior state") {
    import java.sql.Timestamp
    import graft.operators.AsOfJoin
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val left = Seq((1L, 10L, ts(5)), (1L, 11L, ts(10)), (1L, 12L, ts(2)), (2L, 20L, ts(5)))
      .toDF("k", "row_id", "ts")
    val right = Seq((1L, ts(3), 30.0), (1L, ts(10), 100.0), (3L, ts(1), 9.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "v").collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(10L) === Some(30.0))  // latest state at ts<=5 is ts(3)
    assert(out(11L) === Some(100.0)) // equal-ts state matches (>= semantics)
    assert(out(12L) === None)        // before any state
    assert(out(20L) === None)        // key with no state rows at all
  }

  test("salted join equals the plain join exactly") {
    import graft.operators.SkewJoin
    val fact = Seq((1L, 100L, 10.0), (1L, 101L, 20.0), (2L, 102L, 5.0), (9L, 103L, 1.0))
      .toDF("k", "row_id", "x")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "row_id", nSalts = 4)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("hash split is deterministic, disjoint, and exhaustive") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sfDir)
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", buckets = 10, testBuckets = 3)
    assert(train.count() + test.count() === docs.count())
    assert(train.join(test, "doc_id").count() === 0)
    // rerun yields the identical membership
    val (train2, _) = Sampling.trainTestSplit(docs, "doc_id", buckets = 10, testBuckets = 3)
    assert(train.select("doc_id").exceptAll(train2.select("doc_id")).count() === 0)
  }

  test("PPM codec: encode/decode round-trips bytes exactly, header tolerant") {
    import graft.operators.PpmCodec
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(9)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val (w2, h2, rgb2) = PpmCodec.decode(PpmCodec.encode(w, h, rgb))
      assert(w2 === w); assert(h2 === h); assert(rgb2.toSeq === rgb.toSeq)
    }
    // comment + extra whitespace in the header must parse (the format
    // allows both); pixel bytes may legitimately start with whitespace
    val rgb = Array.tabulate[Byte](12)(_.toByte)
    val loose = ("P6 # a comment\n 2\t2 \n255\n".getBytes("US-ASCII") ++ rgb)
    val (lw, lh, lrgb) = PpmCodec.decode(loose)
    assert((lw, lh) === ((2, 2))); assert(lrgb.toSeq === rgb.toSeq)
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n1 1\n255\nxxx".getBytes))
  }

  test("ImageIO codec: PNG round-trips pixels exactly and sniffs through decodeAny") {
    import graft.operators.{ImageIoCodec, Multimodal}
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(9)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val png = ImageIoCodec.encodePng(w, h, rgb)
      // PNG magic, not P6 — decodeAny must route to ImageIO
      assert(png(0) === 0x89.toByte && png(1) === 'P'.toByte)
      val (w2, h2, rgb2) = Multimodal.decodeAny(png)
      assert(w2 === w); assert(h2 === h); assert(rgb2.toSeq === rgb.toSeq)
    }
    intercept[IllegalArgumentException](ImageIoCodec.decode(Array[Byte](1, 2, 3)))
  }

  test("PNG payloads produce the identical decoded fingerprint as P6 payloads") {
    val docs = Seq((7L, "ignored"), (9L, "ignored")).toDF("doc_id", "text")
    val viaPpm = Multimodal.extractImageFeatures(
      Multimodal.syntheticImages(docs, w = 8, h = 6))
      .select("doc_id", "width", "height", "rgb_sha256")
    val viaPng = Multimodal.extractImageFeatures(
      Multimodal.syntheticPngImages(docs, w = 8, h = 6))
      .select("doc_id", "width", "height", "rgb_sha256")
    assert(viaPpm.exceptAll(viaPng).count() === 0)
    assert(viaPng.exceptAll(viaPpm).count() === 0)
  }

  test("imagePHash: hand-checked bits, PNG == P6 parity, similar images collide") {
    // 1x4 image, grays 10, 10, 10, 250 -> mean 70 -> only pixel 3 above
    val rgb = Array[Byte](10, 10, 10, 10, 10, 10, 10, 10, 10,
      250.toByte, 250.toByte, 250.toByte)
    val payload = graft.operators.PpmCodec.encode(4, 1, rgb)
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val row = Multimodal.imagePHash(df).collect().head
    assert(row.getInt(1) === 4)
    assert(row.getLong(2) === (1L << 3))
    // container parity: the hash reads decoded pixels, so PNG == P6
    val docs = Seq((7L, "x"), (9L, "x")).toDF("doc_id", "text")
    val viaPpm = Multimodal.imagePHash(
      Multimodal.syntheticImages(docs, w = 8, h = 6))
    val viaPng = Multimodal.imagePHash(
      Multimodal.syntheticPngImages(docs, w = 8, h = 6))
    assert(viaPpm.exceptAll(viaPng).count() === 0)
    assert(viaPng.exceptAll(viaPpm).count() === 0)
    // perceptual property: a +1-brightness clone hashes identically
    // (threshold is relative to the image's own mean)
    val base = Array.tabulate(48 * 3)(i => (i % 97).toByte)
    val brighter = base.map(b => math.min((b & 0xff) + 1, 255).toByte)
    val pair = Seq(
      (1L, graft.operators.PpmCodec.encode(8, 6, base)),
      (2L, graft.operators.PpmCodec.encode(8, 6, brighter))).toDF("doc_id", "payload")
    val hashes = Multimodal.imagePHash(pair).select("phash")
      .collect().map(_.getLong(0))
    assert(hashes(0) === hashes(1))
  }

  test("WAV codec: round-trips PCM16, skips unknown chunks, rejects junk") {
    import graft.operators.WavCodec
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(200)
      val xs = Array.fill(n)(rnd.nextInt(65536).toShort)
      val rate = 8000 + rnd.nextInt(40000)
      val (r2, xs2) = WavCodec.decode(WavCodec.encode(rate, xs))
      assert(r2 === rate); assert(xs2.toSeq === xs.toSeq)
    }
    // real-world files carry LIST/INFO metadata chunks (odd lengths are
    // word-padded) — splice one between the header and fmt; the chunk
    // walk must skip it and still find fmt + data
    val canon = WavCodec.encode(44100, Array[Short](1, -2, 3))
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = canon.take(12) ++ junk ++ canon.drop(12)
    val (r3, xs3) = WavCodec.decode(spliced)
    assert(r3 === 44100); assert(xs3.toSeq === Seq[Short](1, -2, 3))
    intercept[IllegalArgumentException](WavCodec.decode("nope".getBytes))
    intercept[IllegalArgumentException](WavCodec.decode(canon.take(20))) // truncated
  }

  test("audioStats matches hand-computed waveform features") {
    import graft.operators.{Multimodal, WavCodec}
    val xs = Array[Short](100, -300, 0, 200)
    val df = Seq((3L, WavCodec.encode(16000, xs))).toDF("doc_id", "payload")
    val row = Multimodal.audioStats(df).head
    assert(row.getInt(1) === 16000)
    assert(row.getInt(2) === 4)
    assert(row.getDouble(3) === 0.0)                 // (100-300+0+200)/4
    assert(row.getDouble(4) === math.sqrt((100.0 * 100 + 300 * 300 + 200 * 200) / 4))
    assert(row.getInt(5) === 300)
  }

  test("audioSegments run-length-numbers silence/active windows map-side") {
    import graft.operators.{Multimodal, WavCodec}
    // 6 windows of 2 samples: S S A A S A  (silence rms < 10)
    val xs = Array[Short](1, -1, 2, 0, 500, 300, 400, -200, 3, 1, 600, -600)
    val df = Seq((7L, WavCodec.encode(8000, xs))).toDF("doc_id", "payload")
    val rows = Multimodal.audioSegments(df, winSize = 2, silenceRms = 10.0)
      .orderBy("win_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === (1 to 6))
    assert(rows.map(_.getBoolean(4)).toSeq ===
      Seq(true, true, false, false, true, false))
    assert(rows.map(_.getInt(5)).toSeq === Seq(1, 1, 2, 2, 3, 4))
    assert(rows.head.getDouble(3) === math.sqrt(1.0)) // rms of (1,-1)
    // window 3: rms of (500,300)
    assert(rows(2).getDouble(3) === math.sqrt((500.0 * 500 + 300 * 300) / 2))
    // ragged clip length fails loudly rather than silently truncating
    intercept[Exception](
      Multimodal.audioSegments(df, winSize = 5, silenceRms = 10.0).collect())
  }

  test("JPEG decodes through the same operators within lossy tolerance") {
    import graft.operators.ImageIoCodec
    val docs = Seq((5L, "ignored")).toDF("doc_id", "text")
    val w = 8; val h = 6
    val rgb = Array.tabulate[Byte](w * h * 3)(p => ((5L * 31 + p) % 256).toByte)
    val jpgDf = Seq((5L, ImageIoCodec.encode(w, h, rgb, "jpg"))).toDF("doc_id", "payload")
    val row = Multimodal.imageStats(jpgDf).head
    assert(row.getInt(1) === w && row.getInt(2) === h)
    // lossy but bounded: channel means of the decoded JPEG stay near the
    // source means (JDK encoder, quality default — generous bound)
    def mean(c: Int) = (0 until w * h).map(p => rgb(p * 3 + c) & 0xff).sum.toDouble / (w * h)
    for (c <- 0 until 3)
      assert(math.abs(row.getDouble(3 + c) - mean(c)) < 32.0, s"channel $c drifted")
  }

  test("GIF codec: multi-frame gray round-trip is bit-exact, frames stay ordered") {
    import graft.operators.GifCodec
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val nf = 1 + rnd.nextInt(4)
      val frames = Seq.fill(nf)(Array.fill(w * h)(rnd.nextInt(256).toByte))
      val (w2, h2, decoded) = GifCodec.decodeFrames(GifCodec.encodeFrames(w, h, frames))
      assert(w2 === w && h2 === h && decoded.length === nf)
      frames.zip(decoded).zipWithIndex.foreach { case ((src, rgb), f) =>
        for (p <- 0 until w * h; c <- 0 until 3)
          assert((rgb(p * 3 + c) & 0xff) === (src(p) & 0xff), s"frame $f pixel $p ch $c")
      }
    }
    intercept[Exception](GifCodec.decodeFrames("not a gif".getBytes))
  }

  test("gifFrameStats matches hand-computed per-frame means") {
    import graft.operators.{GifCodec, Multimodal}
    val w = 4; val h = 2
    val f0 = Array.tabulate[Byte](w * h)(p => (p * 10).toByte)       // mean 35
    val f1 = Array.tabulate[Byte](w * h)(p => (200 + p).toByte)      // mean 203.5
    val df = Seq((7L, GifCodec.encodeFrames(w, h, Seq(f0, f1)))).toDF("doc_id", "payload")
    val rows = Multimodal.gifFrameStats(df).orderBy("frame_idx").collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(1) === 1 && rows(1).getInt(1) === 2)       // frame_idx
    assert(rows.forall(r => r.getInt(2) === 2 && r.getInt(3) === w && r.getInt(4) === h))
    assert(rows(0).getDouble(5) === 35.0)
    assert(rows(1).getDouble(5) === 203.5)
  }

  test("hammingNearDupPairs equals brute force (banding complete for maxDist < bands)") {
    // planted near-dups: (2k, 2k+1) share a base image with pixel 0
    // saturated on the odd member — the operator must find exactly the
    // brute-force within-6 pair set (pigeonhole: 6 flipped bits leave
    // >= one of the 8 six-bit bands untouched), and the result must be
    // dominated by the planted pairs, not a hash-collapse soup
    val hashes = Multimodal.imagePHash(
      Multimodal.syntheticNearDupImages(Tables.documents(spark, sfDir), w = 8, h = 6))
      .select(col("doc_id"), col("phash"))
    val got = Dedup.hammingNearDupPairs(hashes, bits = 48, numBands = 8, maxDist = 6,
      hashCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ida, ha) <- hs; (idb, hb) <- hs if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ida, idb, d)).toSet
    assert(got === want)
    val planted = got.filter { case (a, b, _) => a / 2 == b / 2 }
    assert(planted.size >= hs.length / 2 * 9 / 10, s"planted pairs missing: ${planted.size}")
    assert(got.size <= planted.size + hs.length / 10,
      s"near-dup soup: ${got.size} pairs for ${planted.size} planted")
  }

  test("hammingNearDupPairs rejects incomplete banding configs") {
    val hashes = Seq((1L, 3L), (2L, 5L)).toDF("doc_id", "hash")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(hashes, bits = 48, numBands = 8, maxDist = 8)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(hashes, bits = 48, numBands = 7, maxDist = 3)
    }
  }

  test("d12 banding shuffles on (band, bucket) and never degrades to a cross join") {
    val p = PipelineQueries.queries("d12_image_neardups")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("sorted_pairs"), s"in-task pair emission missing:\n${p.take(3000)}")
    assert("hashpartitioning\\(band_idx".r.findFirstIn(p).isDefined,
      s"no banding exchange:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation degraded to a cross join:\n${p.take(3000)}")
  }

  test("streaming contamination equals the batch operator (zero-state per-doc screen)") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.streaming.StreamingOps.streamContamination(
      spark, s"$sfDir/documents.parquet",
      docs.filter(col("doc_id") % 10 === 7), n = 6,
      trainPred = col("doc_id") % 10 =!= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.contaminationPairs(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7), n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(want.nonEmpty, "contamination scenario is vacuous at this sf")
  }

  test("PPM nearest-neighbor resize picks floor-mapped source pixels") {
    import graft.operators.PpmCodec
    // 2x2 image with distinct channels per pixel; upscale to 4x4 must
    // replicate each source pixel in a 2x2 block
    val rgb = Array.tabulate[Byte](12)(i => (i * 10).toByte)
    val up = PpmCodec.resizeNearest(2, 2, rgb, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val sp = ((y / 2) * 2 + (x / 2)) * 3 + c
      assert(up((y * 4 + x) * 3 + c) === rgb(sp), s"pixel ($x,$y) channel $c")
    }
    // downscale 4x4 -> 2x2 keeps pixels (0,0),(2,0),(0,2),(2,2)
    val down = PpmCodec.resizeNearest(4, 4, up, 2, 2)
    assert(down.toSeq === rgb.toSeq)
  }

  test("weightedSample favors heavy rows and is partitioning-invariant") {
    import graft.operators.Sampling
    // 250 heavy (w=100) and 250 light (w=1) rows: a weight-proportional
    // sample of 50 should be dominated by heavy rows (deterministic
    // given the md5 uniforms — no flakiness)
    val df = (0L until 500L).map(i => (i, if (i < 250) 100 else 1)).toDF("doc_id", "w")
    val picked = Sampling.weightedSample(df, "doc_id", "w", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(picked.size === 50)
    val heavy = picked.count(_ < 250)
    assert(heavy >= 45, s"only $heavy/50 heavy rows sampled")
    // identical sample under a different physical layout
    val repicked = Sampling.weightedSample(df.repartition(7), "doc_id", "w", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(repicked === picked)
  }

  test("weightedSample fails loudly on a non-positive weight") {
    // ln(u)/w flips sign for w < 0 (bad row deterministically wins) and
    // -Inf for w = 0 (silently never sampled) — the guard must raise
    val df = Seq((1L, 5), (2L, 0)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      graft.operators.Sampling.weightedSample(df, "doc_id", "w", 2).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("non-positive"), s"unexpected error: ${messages(e)}")
  }

  test("weighted sample top-k is associative over any split (the s18 invariance)") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 600L).map(i => (i, (i % 97 + 1).toInt)).toDF("doc_id", "w")
    val whole = Sampling.weightedSample(df, "doc_id", "w", k = 25)
      .select("doc_id").as[Long].collect().toList
    // three arbitrary disjoint slices -> per-slice top-25 -> re-cut
    val parts = Seq(
      df.filter(col("doc_id") % 3 === 0),
      df.filter(col("doc_id") % 3 === 1),
      df.filter(col("doc_id") % 3 === 2))
    val acc = parts.map(Sampling.weightedSample(_, "doc_id", "w", k = 25)
      .drop("sample_rank")).reduce(_ union _)
    val folded = acc.orderBy(col("sample_key").desc, col("doc_id")).limit(25)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("sample_key").desc, col("doc_id"))))
      .select("doc_id").as[Long].collect().toList
    assert(folded === whole)
  }

  test("sourceCap keeps the longest `cap` docs per source, ties by id") {
    val docs = Seq(
      (1L, "s1", 10L), (2L, "s1", 30L), (3L, "s1", 30L), (4L, "s1", 5L),
      (9L, "s2", 7L))
      .toDF("doc_id", "source", "n_chars")
    val r = PipelineQueries.sourceCap(docs, cap = 2)
      .select("source", "rank", "doc_id").as[(String, Int, Long)].collect().toList
    // s1: the two 30-char docs win, lower id first; the 10/5-char tail drops
    assert(r === List(("s1", 1, 2L), ("s1", 2, 3L), ("s2", 1, 9L)))
  }

  test("bigramLmScores: hand-computed interpolated bigram log-probs; short docs drop") {
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val r = PipelineQueries.bigramLmScores(docs)
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().toList
    // uni: a=3, b=2, x=1, N=6; bigrams doc1=(a,b),(b,a) doc2=(b,a)
    // cb: (a,b)=1, (b,a)=2
    val pAB = 0.9 * 1.0 / 3 + 0.1 * 2.0 / 6 // P(b|a) interp
    val pBA = 0.9 * 2.0 / 2 + 0.1 * 3.0 / 6 // P(a|b) interp
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === List(
      (1L, 2L, r6((math.log(pAB) + math.log(pBA)) / 2)),
      (2L, 1L, r6(math.log(pBA)))))
  }

  test("streaming serve faces return an empty, schema-correct result on an empty feed") {
    val corpus = Seq((10L, "alpha beta")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("query_id", "text")
    val r = graft.streaming.StreamingOps.streamBm25Serve(
      spark, empty, corpus, n = 5, maxTokenDf = Long.MaxValue)
    assert(r.count() === 0)
    assert(r.columns.toSet === Set("query_id", "doc_id", "bm25", "lex_rank"))
  }

  test("streamMinHashScreen flags a planted near-dup ingest, passes clean docs") {
    val mk = (id: Long, text: String) => (id, text)
    val corpus = Seq(
      mk(10L, "the quick brown fox jumps over the lazy dog today"),
      mk(11L, "completely different content about spark query planning"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 10
      mk(2L, "unrelated fresh material nothing shared with anything here"))
      .toDF("doc_id", "text")
    val r = graft.streaming.StreamingOps.streamMinHashScreen(
      spark,
      graft.operators.Dedup.shingled(incoming, n = 3),
      graft.operators.Dedup.shingled(corpus, n = 3),
      numHashes = 6, bandSize = 2)
      .select("in_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 10L)), s"planted dup not flagged: $r")
    assert(!r.exists(_._1 == 2L), s"clean doc flagged: $r")
  }

  test("Profiler.profile: one-pass nulls/distincts/min-max per column, nulls excluded from distinct") {
    import graft.operators.Profiler
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a")))
      .toDF("id", "s")
    val r = Profiler.profile(df, Seq("id", "s"))
      .select("column", "n_rows", "n_nulls", "n_distinct", "hll_ok", "min_str", "max_str")
      .as[(String, Long, Long, Long, Boolean, String, String)].collect().toList
    assert(r === List(
      ("id", 4L, 1L, 2L, true, "1", "2"),
      ("s", 4L, 1L, 2L, true, "a", "b")))
  }

  test("audioFrameFeatures: hand-computed energy/ZCR/peak; crossings only inside a window") {
    import graft.operators.{Multimodal, WavCodec}
    val xs = Array[Short](1, -1, 2, -2)
    val df = Seq((5L, WavCodec.encode(8000, xs))).toDF("doc_id", "payload")
    val r = Multimodal.audioFrameFeatures(df, winSize = 2)
      .select("win_idx", "energy", "zero_crossings", "peak")
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1).toList
    // win 1 = [1,-1]: energy 2, one flip, peak 1
    // win 2 = [2,-2]: energy 8, one flip, peak 2 — the (-1 -> 2) boundary
    // flip between windows is NOT counted
    assert(r === List((1, 2L, 1, 1), (2, 8L, 1, 2)))
  }

  test("centerCrop: floor-midpoint offsets, oversize crops clamp to the image") {
    // 3x3 image with a distinct center pixel: crop 1x1 must pick (1,1)
    val rgb = new Array[Byte](27)
    rgb((1 * 3 + 1) * 3) = 100; rgb((1 * 3 + 1) * 3 + 1) = 101; rgb((1 * 3 + 1) * 3 + 2) = 102
    val payload = graft.operators.PpmCodec.encode(3, 3, rgb)
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val c1 = Multimodal.centerCrop(df, 1, 1).select("out_width", "out_height", "mean_r", "mean_g", "mean_b")
      .collect().head
    assert((c1.getInt(0), c1.getInt(1)) === ((1, 1)))
    assert((c1.getDouble(2), c1.getDouble(3), c1.getDouble(4)) === ((100.0, 101.0, 102.0)))
    // even crop of an odd image: floor midpoint offset (3-2)/2 = 0 -> rows/cols 0..1
    val c2 = Multimodal.centerCrop(df, 2, 2).select("mean_r").collect().head.getDouble(0)
    assert(c2 === 100.0 / 4) // only the center pixel is nonzero among (0,0),(1,0),(0,1),(1,1)
    // oversize crop clamps to the whole image
    val c3 = Multimodal.centerCrop(df, 10, 10)
      .select("out_width", "out_height", "mean_r").collect().head
    assert((c3.getInt(0), c3.getInt(1)) === ((3, 3)))
    assert(c3.getDouble(2) === 100.0 / 9)
  }

  test("stratifiedSample: per-stratum rates, disjoint from nothing, default applies") {
    import graft.operators.Sampling
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang",
      buckets = 10, rates = Map("en" -> 0), defaultAccept = 10)
      .select("lang").as[String].collect()
    assert(!kept.contains("en"), "rate 0 must drop the whole stratum")
    assert(kept.count(_ == "fr") === 1000, "accept == buckets keeps everything")
    // membership is exactly the per-stratum restriction of the flat sample
    val flat = Sampling.deterministicSample(df, "doc_id", buckets = 10, accept = 3)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val strat = Sampling.stratifiedSample(df, "doc_id", "lang",
      buckets = 10, rates = Map("en" -> 3), defaultAccept = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(strat === flat)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "doc_id", "lang", 10, Map("en" -> 11), 5)
    }
  }

  test("repetition ratios: hand-computed duplicate token/trigram fractions") {
    val docs = Seq(
      (1L, "a a a a"),       // 4 tokens 1 distinct -> 0.75; trigrams: "a a a" x2 -> 0.5
      (2L, "w x y z"),       // all unique -> 0, trigrams unique -> 0
      (3L, "a b"))           // no trigram -> ratio 0
      .toDF("doc_id", "text")
    // reuse the gated query's column logic through a temp dir-free path:
    // recompute with the same expressions the query uses
    import graft.functions.TextFunctions
    val ts = TextFunctions.tokens(col("text"))
    val grams = expr(
      "CASE WHEN size(split(text, ' ')) >= 3 THEN " +
        "transform(sequence(1, size(split(text, ' ')) - 2, 1), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) " +
        "ELSE array() END")
    val r = docs.select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(ts)).cast("double") / size(ts).cast("double"), 6).as("dt"),
        when(size(grams) === 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"), 6)).as("dg"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toList.sortBy(_._1)
    assert(r === List((1L, 0.75, 0.5), (2L, 0.0, 0.0), (3L, 0.0, 0.0)))
  }

  test("scrubPii redacts emails and phones, leaves clean text untouched") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "mail me at a.b+c@sub.example.org today"),
      (2L, "call +1-555-0100 or +44-207-946-0958"),
      (3L, "no pii here at all"),
      (4L, "two mails x@y.io and z@w.co plus +1-555-0199"))
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        TextFunctions.scrubPii(col("text")).as("t"),
        TextFunctions.matchCount(col("text"), TextFunctions.emailRe).as("ne"),
        TextFunctions.matchCount(col("text"), TextFunctions.phoneRe).as("np"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toList.sortBy(_._1)
    assert(r(0) === ((1L, "mail me at <EMAIL> today", 1L, 0L)))
    assert(r(1) === ((2L, "call <PHONE> or <PHONE>", 0L, 2L)))
    assert(r(2) === ((3L, "no pii here at all", 0L, 0L)))
    assert(r(3) === ((4L, "two mails <EMAIL> and <EMAIL> plus <PHONE>", 2L, 1L)))
  }

  test("tokenChunks windows cover every token; short docs yield one chunk") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // size 3, stride 2 -> starts 1,3,5,7
      (2L, "a"),                    // one 1-token chunk
      (3L, ""))                     // split("") = [""] -> one chunk of the empty token
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        explode(TextFunctions.tokenChunks(col("text"), size = 3, stride = 2)).as("c"))
      .select(col("doc_id"), col("c.start"), col("c.toks"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2).toList)).toList
    val d1 = r.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2) === List(1, 3, 5, 7))
    assert(d1.head._3 === List("t1", "t2", "t3"))
    assert(d1.last._3 === List("t7")) // trailing short window kept
    // every token appears in at least one chunk
    assert(d1.flatMap(_._3).toSet === (1 to 7).map("t" + _).toSet)
    assert(r.filter(_._1 == 2L) === List((2L, 1, List("a"))))
    assert(r.filter(_._1 == 3L) === List((3L, 1, List(""))))
  }

  test("packing: every non-oversize bin fits the budget, chunks partition exactly") {
    import spark.implicits._
    val chunks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokenChunks(
          col("text"), size = 32, stride = 24)).as("c"))
      .select(col("doc_id"), col("c.start").as("start"),
        size(col("c.toks")).as("n_tokens"))
    val budget = 100
    val bins = graft.operators.Packing.packChunks(chunks, budget, numGroups = 8)
      .collect()
    val bad = bins.filter(r =>
      !r.getAs[Boolean]("oversize") && r.getAs[Long]("bin_tokens") > budget)
    assert(bad.isEmpty, s"bins over budget: ${bad.take(3).mkString(", ")}")
    // every chunk lands in exactly one bin
    assert(bins.map(_.getAs[Long]("n_chunks")).sum === chunks.count())
    // no bin holds more chunks than its class capacity
    assert(bins.forall(r => r.getAs[Long]("n_chunks") <= r.getAs[Int]("class")))
  }

  test("packing edge cases: oversize chunk, exact fit, empty input") {
    import spark.implicits._
    // oversize (150 > budget 100): own bin, flagged; exact fit (100):
    // class 1, alone, full, NOT flagged; two 50s share one class-2 bin
    // the 0-token chunk (upstream tokenizer garbage) must be DROPPED —
    // budget/0 would otherwise overflow into a negative class
    val chunks = Seq(
      (1L, 0, 150), (2L, 0, 100), (3L, 0, 50), (4L, 0, 50), (5L, 0, 0)
    ).toDF("doc_id", "start", "n_tokens")
    val bins = graft.operators.Packing.packChunks(chunks, 100, numGroups = 1)
      .collect().map(r => (r.getAs[Int]("class"), r.getAs[Int]("bin"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("bin_tokens"),
        r.getAs[Boolean]("oversize"))).toList
    assert(bins === List(
      (1, 0, 1L, 150L, true),   // oversize alone, flagged
      (1, 1, 1L, 100L, false),  // exact fit fills its bin
      (2, 0, 2L, 100L, false))) // two 50s pack to exactly the budget
    // empty input -> empty result, schema intact
    val empty = graft.operators.Packing.packChunks(
      chunks.limit(0), 100, numGroups = 4)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq ===
      Seq("class", "grp", "bin", "n_chunks", "bin_tokens", "oversize"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for LLM-data pipelines, each designed around a
  * single equi-join/shuffle so the plan scales:
  *
  *  - exact: hash-groupBy on content digest — one shuffle on the digest.
  *  - n-gram Jaccard: inverted-index join on shingles — only pairs sharing
  *    a shingle are generated (never the n^2 cross join).
  *  - MinHash+LSH: signatures per doc, banded buckets, pairs from bucket
  *    join — candidate generation cost is O(docs x bands).
  *  - SimHash: 32-bit per-doc fingerprint; near-dups share fingerprints
  *    (or low Hamming distance).
  *  - embedding cosine: brute-force pair scan here (small dims tables);
  *    the scale path is VectorIndex/LSH-bucketed search.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text with the
    * surviving (minimum) id and the duplicate count. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("digest"), col("keep_id"), col("n_dups"))

  /** Exact dedup after canonical normalization
    * ([[TextFunctions.normalizeText]]): catches duplicates that differ
    * only in case, punctuation, or whitespace — the class raw exact dedup
    * (d1) misses. Same plan shape as [[exactDedup]]: one map-side
    * normalize + digest, one hash-groupBy shuffle on the 16-byte digest;
    * at 100 TB the shuffle carries digests, never text. */
  def normalizedDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(TextFunctions.normalizeText(col(textCol))).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("digest"), col("keep_id"), col("n_dups"))

  /** Pairs with word-n-gram Jaccard >= threshold, via inverted-index join
    * on distinct shingles. Output (doc_a, doc_b, jaccard), doc_a < doc_b.
    * The filter applies to the 6-dp-rounded value (so the oracle's rounding
    * matches exactly). */
  /** Shingled form (doc_id, shingles) — shared input of the Jaccard and
    * MinHash operators; callers running both should compute it once and
    * cache (shingling is the expensive scalar work). */
  def shingled(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextFunctions.wordShingles(col(textCol), n).as("shingles"))

  def ngramJaccardPairs(
      docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    ngramJaccardPairsFromShingles(
      shingled(docs, n, idCol, textCol).cache(), threshold)

  /** Pair generation over a precomputed (doc_id, shingles) table.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *   docs before pair emission — a near-universal shingle cannot push a
    *   pair over any useful Jaccard threshold but inflates the emitted
    *   pairs quadratically; the 100 TB knob. Note the intersection counts
    *   of surviving pairs then undercount capped shingles, so results are
    *   a (deliberate) lower bound when the cap is active; the default
    *   keeps exact semantics. */
  def ngramJaccardPairsFromShingles(
      sh: DataFrame, threshold: Double,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("sz"))
    val inter = pairIntersections(sh, maxShingleDf)
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Fuzzy near-match pairs by EDIT DISTANCE over a bounded prefix —
    * the record-linkage face (titles, leading content) that set-based
    * Jaccard can't express: transpositions, single-char edits, and
    * insertions all count as unit distance. Candidate generation reuses
    * the shared posting kernel ([[pairIntersections]] — only pairs
    * sharing a word n-gram are ever scored, never the n^2 cross join);
    * verification is one Levenshtein DP over `prefixLen`-char prefixes
    * per candidate — integer, exact, engine-identical, and O(prefixLen^2)
    * BOUNDED per pair regardless of document length (running edit
    * distance on full web documents would be quadratic in doc size;
    * bounding to the prefix is what makes the verify affordable at
    * corpus scale). Output (doc_a, doc_b, edit_dist), doc_a < doc_b. */
  def fuzzyPrefixPairs(
      docs: DataFrame, n: Int, prefixLen: Int, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text",
      maxShingleDf: Int = Int.MaxValue): DataFrame =
    fuzzyPrefixPairsFromShingles(
      shingled(docs, n, idCol, textCol), docs, prefixLen, maxDist,
      idCol, textCol, maxShingleDf)

  /** [[fuzzyPrefixPairs]] over a precomputed (doc_id, shingles) table —
    * callers already running d2/d3 share ONE shingling + posting pass. */
  def fuzzyPrefixPairsFromShingles(
      sh: DataFrame, docs: DataFrame, prefixLen: Int, maxDist: Int,
      idCol: String = "doc_id", textCol: String = "text",
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    require(prefixLen > 0 && maxDist >= 0, s"bad params ($prefixLen, $maxDist)")
    val pre = docs.select(col(idCol).as("doc_id"),
      substring(col(textCol), 1, prefixLen).as("pre"))
    pairIntersections(sh, maxShingleDf)
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pre_a")), "doc_a")
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pre_b")), "doc_b")
      // thresholded (banded) Levenshtein: O(prefixLen x maxDist) per pair
      // instead of the full O(prefixLen^2) DP, with -1 for pairs over the
      // bound — exact for every kept pair, so results are identical and
      // the verify stage stops dominating when candidates are dense
      .withColumn("edit_dist", levenshtein(col("pre_a"), col("pre_b"), maxDist))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }

  /** Shared pair-intersection kernel behind the Jaccard (d2) and
    * containment (d14) pair operators: (doc_a, doc_b, inter) with
    * doc_a < doc_b and `inter` = |shingles(doc_a) ∩ shingles(doc_b)|,
    * for pairs sharing at least one shingle with document frequency
    * <= `cap`. */
  private[operators] def pairIntersections(sh: DataFrame, cap: Int): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    // join-free pair generation, fused: ONE shuffle co-locates postings by
    // shingle (sorted within partition so a shingle's docs are adjacent);
    // each task then walks its groups, emits the i<j pairs of each posting
    // list, and pre-aggregates pair counts into a bounded in-task map
    // (flushed as partial rows when full — memory stays capped, the final
    // groupBy sums partials). The second shuffle therefore carries
    // near-distinct (doc_a, doc_b) partials, not one row per co-occurrence.
    // Cost is sum over shingles of m^2 — benign unless a shingle is
    // near-universal; `cap` (maxShingleDf at the callers) is that knob.
    // postings are keyed by xxhash64(shingle), not the shingle string: the
    // shuffle then moves (long, long) rows instead of string-keyed rows
    // (cheaper ser/deser + comparisons; the grouping only needs group
    // boundaries, never the text). A 64-bit collision between two distinct
    // shingles merges their posting lists: self-pairs from a doc holding
    // both colliding shingles are guarded in emitGroup, but that doc's
    // pairs with the merged group's other members are counted once per
    // duplicate entry — intersections can overcount, so Jaccard is exact
    // only up to ~n^2/2^65 collision odds (accepted; the string-keyed
    // formulation had none).
    val partials = sh
      .select(col("doc_id").cast("long"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)]
      .repartition(col("h"))
      .sortWithinPartitions(col("h"))
      .mapPartitions { it =>
        // lazily interleave consumption and emission: when the in-task
        // count map reaches its bound it is DRAINED to the output stream
        // (not buffered) — peak memory is one map, however many partial
        // pairs the partition produces
        val bit = it.buffered
        val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
        new Iterator[(Long, Long, Long)] {
          private val counts = new java.util.HashMap[(Long, Long), Long](1 << 16)
          private var drain: java.util.Iterator[java.util.Map.Entry[(Long, Long), Long]] =
            java.util.Collections.emptyIterator()
          private def emitGroup(): Unit = {
            val m = docs.length
            if (m >= 2 && m <= cap) {
              val a = docs.toArray
              java.util.Arrays.sort(a)
              var i = 0
              while (i < m - 1) {
                var j = i + 1
                while (j < m) {
                  // a(i)==a(j) only if a 64-bit shingle-hash collision put
                  // one doc in the group twice — never emit a self-pair
                  if (a(i) != a(j)) counts.merge((a(i), a(j)), 1L, (x, y) => x + y)
                  j += 1
                }
                i += 1
              }
            }
            docs.clear()
          }
          private var draining = false
          private def fill(): Unit = {
            if (draining && !drain.hasNext) { counts.clear(); draining = false }
            // accumulate groups until the map is worth draining or input ends
            while (!draining && bit.hasNext && counts.size <= (1 << 20)) {
              val cur = bit.head._2
              while (bit.hasNext && bit.head._2 == cur) docs += bit.next()._1
              emitGroup()
            }
            if (!draining && counts.size > 0 && (counts.size > (1 << 20) || !bit.hasNext)) {
              drain = counts.entrySet().iterator()
              draining = true
            }
          }
          def hasNext: Boolean = { fill(); drain.hasNext }
          def next(): (Long, Long, Long) = {
            fill()
            val kv = drain.next()
            (kv.getKey._1, kv.getKey._2, kv.getValue)
          }
        }
      }
      .toDF("doc_a", "doc_b", "partial")
    partials
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("partial")).as("inter"))
  }

  /** Asymmetric CONTAINMENT near-dup pairs — the quote/subset detector
    * Jaccard structurally misses: a short document wholly embedded in a
    * long one has tiny Jaccard (union is dominated by the long doc) but
    * containment |A ∩ B| / |A| ≈ 1. Emits one row per DIRECTED pair
    * (inner_id, outer_id, containment) with containment >= threshold —
    * both orientations of a pair are tested, so mutual near-copies
    * produce two rows (as d2 would collapse them to one).
    *
    * Same scale shape as d2: the shared [[pairIntersections]] kernel
    * (one xxhash64-keyed posting shuffle, bounded in-task pair maps),
    * then one join against the per-doc shingle-set sizes. `maxShingleDf`
    * caps near-universal shingles exactly as in d2. */
  def containmentPairs(
      docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = shingled(docs, n, idCol, textCol).cache()
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("sz"))
    val inter = pairIntersections(sh, maxShingleDf)
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
    // both orientations from ONE pass over the pair table (a union of two
    // selects would recompute the pair kernel per branch): map-side explode
    inter
      .select(explode(array(
        struct(col("doc_a").as("inner_id"), col("doc_b").as("outer_id"),
          round(col("inter") / col("sz_a"), 6).as("containment")),
        struct(col("doc_b").as("inner_id"), col("doc_a").as("outer_id"),
          round(col("inter") / col("sz_b"), 6).as("containment")))).as("p"))
      .select(col("p.inner_id"), col("p.outer_id"), col("p.containment"))
      .filter(col("containment") >= threshold)
  }

  /** MinHash signatures: numHashes independent min-hashes over distinct
    * word-n-gram shingles. ONE md5 per shingle; hash i is the i-th 5-hex
    * (20-bit) slice of that digest — disjoint slices of a cryptographic
    * hash are independent uniform functions of the shingle, so the mins
    * are statistically equivalent to numHashes separate hashes at 1/numHashes
    * the hashing cost. Deterministic in any engine (md5 + substr).
    * numHashes <= 6 keeps slices within the first 30 hex chars. */
  def minHashSignatures(
      docs: DataFrame, n: Int, numHashes: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minHashSignaturesFromShingles(shingled(docs, n, idCol, textCol), numHashes)

  /** Signatures over a precomputed (doc_id, shingles) table. The whole
    * signature is ONE codegen'd single-pass expression
    * ([[graft.functions.MinHashSlices]]) instead of `numHashes + 1`
    * interpreted HOF array walks. */
  def minHashSignaturesFromShingles(sh: DataFrame, numHashes: Int): DataFrame = {
    val sig = minHashSliceArray(sh, numHashes)
    sig.select(col("doc_id") +:
      (0 until numHashes).map(i => element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
  }

  /** (doc_id, mhs ARRAY<STRING>) — null mhs when a doc has no shingles. */
  private def minHashSliceArray(sh: DataFrame, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column => toCol, expression => toExpr}
    sh.select(col("doc_id"),
      toCol(graft.functions.MinHashSlices(toExpr(col("shingles")), numHashes)).as("mhs"))
  }

  /** LSH candidate pairs: band the signature (bandSize hashes per band),
    * bucket = md5 of the band's concatenated hashes, join docs sharing any
    * bucket. Output distinct (doc_a, doc_b), doc_a < doc_b. */
  def minHashCandidatePairs(
      docs: DataFrame, n: Int, numHashes: Int, bandSize: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minHashCandidatePairsFromShingles(
      shingled(docs, n, idCol, textCol), numHashes, bandSize)

  /** (doc_id, band_idx, bucket) LSH band buckets of the MinHash
    * signature — the reusable half of the candidate machinery: a static
    * corpus computes (and caches) its bucket table once, and any other
    * doc set (a micro-batch of ingests, another corpus) probes it with
    * one equi-join on (band_idx, bucket). Map-side per doc. */
  def minHashBands(sh: DataFrame, numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be a multiple of bandSize")
    val numBands = numHashes / bandSize
    val sigs = minHashSliceArray(sh, numHashes).filter(col("mhs").isNotNull)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(j => element_at(col("mhs"), b * bandSize + j + 1))
      struct(lit(b).as("band_idx"), md5(concat(parts: _*)).as("bucket")).as(s"band$b")
    }
    sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"), col("band.bucket").as("bucket"))
  }

  /** Candidate pairs over a precomputed (doc_id, shingles) table.
    *
    * Shape: band the signature ([[minHashBands]]), bucket docs by
    * (band, md5(band hashes)), then emit each bucket's pairs IN-TASK
    * from the grouped sorted id list ([[graft.functions.SortedPairs]])
    * — one groupBy shuffle of docs x bands *bucket rows* plus the
    * distinct, instead of the previous self-equi-join (two shuffled
    * join branches over the same exploded table). Candidate volume is
    * unchanged (O(docs x bands) bucket rows; pairs only materialize
    * inside each bucket, which is the LSH contract), so the 100 TB
    * story is the same — fewer shuffles, no join build side.
    * Output distinct (doc_a, doc_b), doc_a < doc_b. */
  def minHashCandidatePairsFromShingles(
      sh: DataFrame, numHashes: Int, bandSize: Int): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column => toCol, expression => toExpr}
    minHashBands(sh, numHashes, bandSize)
      .groupBy(col("band_idx"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(toCol(graft.functions.SortedPairs(toExpr(col("ids")))).as(Seq("doc_a", "doc_b")))
      .distinct()
  }

  /** Within-distance Hamming pairs over integer fingerprints (SimHash,
    * aHash, any <=63-bit code) via bit-banding — the multimodal/near-dup
    * analog of [[minHashCandidatePairsFromShingles]]'s bucket machinery.
    *
    * `bits` is split into `numBands` contiguous bit bands; two ids become
    * candidates when any band matches exactly, and candidates are then
    * verified with the exact popcount distance. By pigeonhole the banding
    * is COMPLETE — not approximate — for `maxDist <= numBands - 1`: a
    * pair differing in at most numBands-1 bits leaves at least one band
    * untouched, so every qualifying pair collides in some bucket
    * (enforced by the require; this is what lets a brute-force SQL oracle
    * gate the operator exactly at any data size).
    *
    * Shape: one explode to ids x numBands bucket rows, one groupBy
    * shuffle on (band, bucket), in-task pair emission from the sorted id
    * list (SortedPairs), then a slim verify join back to the (id, hash)
    * table — candidate volume is bounded by bucket co-occupancy, the
    * LSH contract. Output (id_a, id_b, hamming), id_a < id_b. */
  def hammingNearDupPairs(
      hashes: DataFrame, bits: Int, numBands: Int, maxDist: Int,
      idCol: String = "doc_id", hashCol: String = "hash"): DataFrame = {
    import org.apache.spark.sql.graft.GraftSqlBridge.{column => toCol, expression => toExpr}
    require(bits > 0 && bits <= 63, s"bits must be in [1, 63], got $bits")
    require(bits % numBands == 0, s"bits ($bits) must be a multiple of numBands ($numBands)")
    require(maxDist < numBands,
      s"banding is only complete for maxDist < numBands, got maxDist=$maxDist bands=$numBands")
    val r = bits / numBands
    val mask = (1L << r) - 1
    val h = hashes.select(
      col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("h"))
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band_idx"),
        shiftright(col("h"), b * r).bitwiseAND(lit(mask)).as("bucket")).as(s"band$b")
    }
    val cand = h
      .select(col("id"), explode(array(bandCols: _*)).as("band"))
      .select(col("id"), col("band.band_idx").as("band_idx"), col("band.bucket").as("bucket"))
      .groupBy(col("band_idx"), col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(toCol(graft.functions.SortedPairs(toExpr(col("ids")))).as(Seq("id_a", "id_b")))
      .distinct()
    cand
      .join(h.select(col("id").as("id_a"), col("h").as("ha")), "id_a")
      .join(h.select(col("id").as("id_b"), col("h").as("hb")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** 32-bit SimHash fingerprint per document. */
  def simHash(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextFunctions.simHash32(col(textCol)).as("simhash"))

  /** Corpus-wide EXACT-SUBSTRING dedup — "dedup the span, not the doc":
    * finds, for every document, the maximal token spans whose every
    * n-gram also occurs in at least `minDocs - 1` OTHER documents (the
    * repeated-passage remover of LLM training-data pipelines; d2/d3 flag
    * whole near-dup documents, this extracts the shared passages
    * themselves, e.g. boilerplate headers or licenses pasted across
    * otherwise-distinct pages).
    *
    * Shape — three shuffle-friendly stages, no driver materialization:
    *  1. posting lists: explode each doc into positioned token n-grams,
    *     hashed to a 64-bit key IN the explode (the gram string never
    *     leaves its map task — d2's posting-key rule: ~40+ bytes of text
    *     per key would otherwise flow through both shuffles), then
    *     groupBy hash -> cross-doc frequency (one shuffle; Spark plans
    *     exact count-distinct as two-level partial aggregation, so no
    *     posting set ever materializes);
    *  2. seed selection: equi-join grams back to the repeated set (the
    *     repeated-gram table is tiny relative to the corpus — broadcast
    *     or shuffle join, Catalyst/AQE decides);
    *  3. span assembly: per-doc sort-merge of overlapping seed intervals
    *     (gaps-and-islands over a doc-partitioned window — state is one
    *     doc's seeds, never the corpus).
    *
    * Output (doc_id, span_start, span_end, span_tokens), token positions
    * 0-based inclusive. Deterministic (no RNG, no floats), so the DuckDB
    * oracle replays it exactly — hashing the gram key folds two distinct
    * grams together only on an xxhash64 collision (~n^2/2^65, the same
    * accepted odds as d2's posting keys).
    *
    * The `grams` subtree is DELIBERATELY left uncached although stages 1
    * and 2 both consume it: the recompute is map-side tokenize+hash (pure
    * CPU, no exchange), while persisting it would materialize a
    * token-scale intermediate (~24 bytes x every token in the corpus) to
    * executor storage — at 100 TB the recompute is the cheaper side of
    * that trade, and both downstream shuffles stay keyed on the 8-byte
    * hash either way. */
  def repeatedSpans(
      docs: DataFrame, n: Int, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1 && minDocs >= 2, "need n >= 1 and minDocs >= 2")
    val grams = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ts) - $n), " +
          s"i -> struct(i AS pos, xxhash64(concat_ws(' ', slice(ts, i + 1, $n))) AS gh))")).as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.gh").as("gh"))
    val repeated = grams
      .groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gh"))
    val seeds = grams.join(repeated, Seq("gh"))
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + (n - 1)).as("e"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val flagged = seeds.withColumn("brk",
      when(col("s") > coalesce(
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1)), 1).otherwise(0))
    flagged
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Benchmark-contamination check: which training documents share any
    * word n-gram with an evaluation/benchmark set — the n-gram-overlap
    * decontamination primitive of LLM data pipelines. One row per
    * (train_id, eval_id) pair that shares at least one n-gram, with the
    * count of shared DISTINCT n-grams.
    *
    * Scale shape: n-grams are keyed by xxhash64 the moment they are
    * formed (8 bytes per key, the gram string never reaches a shuffle —
    * d2's posting-key pattern); the per-doc distinct-gram reduction is a
    * map-side-combinable aggregate; the EVAL side is broadcast — a
    * benchmark suite is MBs while the corpus is TBs, so the corpus-sized
    * train gram table never shuffles for the join. The only train-sized
    * Exchanges are the per-doc distinct and the final pair count. */
  def contaminationPairs(
      trainDocs: DataFrame, evalDocs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, "need n >= 1")
    distinctGramHashes(trainDocs, n, idCol, textCol, "train_id")
      .join(broadcast(distinctGramHashes(evalDocs, n, idCol, textCol, "eval_id")), Seq("gh"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Per-doc distinct word-n-gram xxhash64 keys: (idOut, gh). */
  private def distinctGramHashes(
      docs: DataFrame, n: Int, idCol: String, textCol: String, idOut: String): DataFrame = docs
    .select(col(idCol).as(idOut), TextFunctions.tokens(col(textCol)).as("ts"))
    .filter(size(col("ts")) >= n)
    .select(col(idOut), explode(expr(
      s"transform(sequence(0, size(ts) - $n), " +
        s"i -> xxhash64(concat_ws(' ', slice(ts, i + 1, $n))))")).as("gh"))
    .distinct()

  /** Bloom-prefiltered contamination check — identical OUTPUT to
    * [[contaminationPairs]] (one row per contaminated (train, eval) pair
    * with the shared distinct-gram count), different 100 TB shape: the
    * eval grams are first folded into a fixed-size Bloom bitset
    * ([[graft.functions.Bloom]]) which prefilters the corpus-sized train
    * gram stream MAP-SIDE, before any shuffle. Only grams that might be
    * contaminated (true matches + the bitset's ~0.1% false positives)
    * reach the exact confirm join, so per-doc distinct aggregation and
    * join traffic shrink from corpus-sized to contamination-sized.
    *
    * The confirm join keeps the operator exact: Bloom false positives are
    * discarded there (no false negatives exist by construction), so the
    * result is bit-identical to the unfiltered operator for ANY bitset
    * size — `nbits` tunes cost, never correctness.
    *
    * vs d9's plain broadcast: the broadcast of raw eval gram rows grows
    * with the eval suite; the bitset is capped at nbits/8 bytes up front
    * (default 128 KiB), so the screen survives eval/blocklist sides far
    * past broadcast limits. */
  def contaminationPairsBloom(
      trainDocs: DataFrame, evalDocs: DataFrame, n: Int,
      nbits: Int = 1 << 20, numHashes: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, "need n >= 1")
    val evalGrams = distinctGramHashes(evalDocs, n, idCol, textCol, "eval_id")
    val bitset = graft.functions.Bloom.build(evalGrams.select(col("gh")), nbits, numHashes)
    // prefilter BEFORE the per-doc distinct: the explode output is pruned
    // map-side, so even the distinct's shuffle only carries candidates
    val trainGrams = trainDocs
      .select(col(idCol).as("train_id"), TextFunctions.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("train_id"), explode(expr(
        s"transform(sequence(0, size(ts) - $n), " +
          s"i -> xxhash64(concat_ws(' ', slice(ts, i + 1, $n))))")).as("gh"))
      .filter(graft.functions.Bloom.mightContain(col("gh"), bitset, numHashes))
      .distinct()
    trainGrams
      .join(broadcast(evalGrams), Seq("gh"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Duplicate clusters from near-dup pairs: connected components by
    * iterative min-label propagation plus pointer jumping. Every doc gets
    * cluster_id = the smallest doc id reachable through dup pairs
    * (singletons keep their own id). The fixpoint is unique, so the
    * result is engine-independent (oracled by a recursive CTE).
    *
    * Scale: each iteration is two equi-joins + a partial min-agg; the
    * label(label(x)) jump makes iterations-to-converge O(log diameter)
    * instead of O(diameter). Each iteration is materialized with
    * localCheckpoint — caching alone keeps the logical plan growing
    * exponentially with iterations (analysis/AQE explain cost, eventual
    * driver OOM); checkpointing truncates lineage so iteration cost stays
    * flat no matter how deep the loop runs. */
  def duplicateClusters(
      docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = docs.select(col(idCol).as("doc_id"), col(idCol).as("cluster_id"))
      .localCheckpoint(true)
    // labels only ever decrease (least of candidates), so the label-sum
    // strictly decreases until the fixpoint — convergence detection is one
    // aggregate on the fresh checkpoint instead of a join with the
    // previous iteration (DECIMAL: exact and overflow-free at any scale)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast(DecimalType(38, 0)))).head
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var it = 0
    while (changed && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nbr_label")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_label")).as("nbr_min"))
      val viaNbrs = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jump: label(x) is itself a doc id, so shortcut one level of
      // indirection per round — min-propagation alone needs diameter rounds
      val next = viaNbrs.as("m")
        .join(labels.select(col("doc_id").as("ptr"), col("cluster_id").as("ptr_label")),
          col("m.cluster_id") === col("ptr"), "left")
        .select(col("m.doc_id").as("doc_id"),
          least(col("m.cluster_id"), coalesce(col("ptr_label"), col("m.cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val curSum = labelSum(next)
      changed = curSum.compareTo(prevSum) != 0
      prevSum = curSum
      // Dataset.unpersist is a no-op for localCheckpoint data (it lives as
      // RDD blocks, not CacheManager entries) — free the superseded
      // iteration's blocks explicitly or up to maxIter copies of the label
      // table pile up until GC
      unpersistCheckpoint(labels)
      labels = next
      it += 1
    }
    labels
  }

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** Embedding near-duplicate pairs: cosine similarity >= threshold,
    * id_a < id_b. EXACT all-pairs, fully distributed: rows are assigned
    * to `blocks` hash blocks and each of the B(B+1)/2 block PAIRS becomes
    * one equi-join key, so every task scores the cross of two blocks and
    * nothing is ever collected to the driver (the previous formulation
    * collected + broadcast the whole table — a 100x-scale killer on a
    * corpus-sized input). Shuffle volume is n*(B+1) rows; compute is the
    * inherent n^2/2 of exactness — for a full corpus, use
    * [[embeddingNearDupPairsLsh]] (candidate-generation + verify) and pay
    * n^2 only within buckets.
    *
    * Math is the same Catalyst expressions the LSH path uses (sequential
    * Double folds; dot and norms commute bitwise, so orientation cannot
    * matter), rounding/filtering identical — results are engine-exact.
    *
    * @param blocks hash-block count; B(B+1)/2 join keys bound task count,
    *   each task holds two blocks of ~n/B vectors. Raise with corpus size
    *   so a block pair fits executor memory. */
  def embeddingNearDupPairs(
      embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blocks: Int = 8): DataFrame = {
    require(blocks >= 1, "blocks must be positive")
    val base = embeddings.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("e"),
      VectorFunctions.l2Norm(col(vecCol)).as("nrm"),
      pmod(xxhash64(col(idCol).cast("long")), lit(blocks)).cast("int").as("blk"))
    // row in block b joins key (b, j) for j >= b on the left and (i, b)
    // for i <= b on the right: a cross-block pair {x,y} (bx < by) meets
    // exactly once at key (bx, by); a same-block pair meets at (b, b) in
    // both orientations and the id_l < id_r filter keeps one
    val lhs = base.select(
      col("id").as("id_l"), col("e").as("el"), col("nrm").as("nl"),
      col("blk").as("blk_l"), col("blk").as("pi"),
      explode(sequence(col("blk"), lit(blocks - 1))).as("pj"))
    val rhs = base.select(
      col("id").as("id_r"), col("e").as("er"), col("nrm").as("nr"),
      col("blk").as("blk_r"), col("blk").as("pj"),
      explode(sequence(lit(0), col("blk"))).as("pi"))
    lhs.join(rhs, Seq("pi", "pj"))
      .filter(col("blk_l") =!= col("blk_r") || col("id_l") < col("id_r"))
      .withColumn("cosine_sim",
        round(VectorFunctions.dotProduct(col("el"), col("er")) /
          (col("nl") * col("nr")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(
        least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        col("cosine_sim"))
  }

  /** The 100 TB near-dup path for embeddings: sign-projection LSH buckets
    * generate candidate pairs (only same-bucket pairs are scored), then
    * exact cosine verifies — the candidate-generation + verify pattern.
    * Approximate BY BUCKETING (cross-bucket near-dups are missed; more
    * planes = fewer candidates, fewer hits), but fully deterministic, so
    * exact SQL oracles apply. */
  def embeddingNearDupPairsLsh(
      embeddings: DataFrame, threshold: Double, numPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("e"),
      LshKnn.bucket(col(vecCol), numPlanes).as("bucket"),
      VectorFunctions.l2Norm(col(vecCol)).as("nrm"))
    val a = bucketed.select(col("id").as("id_a"), col("e").as("ea"),
      col("bucket"), col("nrm").as("norm_a"))
    val b = bucketed.select(col("id").as("id_b"), col("e").as("eb"),
      col("bucket"), col("nrm").as("norm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        round(VectorFunctions.dotProduct(col("ea"), col("eb")) /
          (col("norm_a") * col("norm_b")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * cluster the embedding corpus, then compare pairs ONLY within a
    * cluster and drop every member that has a higher-similarity lower-id
    * twin — the n^2 cosine scan shrinks to sum-of-cluster-sizes^2, the
    * paper's whole point. Clustering reuses [[IvfKnn]]'s deterministic
    * stride-sampled centroids + per-row codegen argmin, so the corpus
    * never shuffles for assignment and the exact SQL oracle replays the
    * quantizer; the keep rule (retain the minimum id of each qualifying
    * pair) matches d10/p1's convention and stays a pure pair predicate —
    * no transitive closure needed.
    *
    * Output: one row per REMOVED vector — (cell, removed_id, kept_id,
    * cosine_sim) where kept_id is the smallest lower-id within-cell
    * neighbor at sim >= threshold and cosine_sim is that pair's
    * similarity. The argmin is ONE struct-min aggregate (partial
    * map-side), not a window sort — d10's 100 TB shape.
    *
    * Scale: the only shuffles are the cell equi-join (key cardinality =
    * numCells; at 100 TB pick numCells ~ sqrt(corpus) so cells stay
    * executor-sized, and the skew knob is AQE skew-join on the cell key)
    * and the bounded groupBy on removed_id. The skew knob is MEASURED to
    * engage (PlanShapeSpec "d15 hot-cell skew"): with one deliberately
    * hot cell the join re-plans to SortMergeJoin(skew=true), both sides
    * sub-split and cross-paired. One config caveat: because the keep-rule
    * aggregate legally reuses the join's cell partitioning (no post-join
    * exchange), the conservative AQE default declines the split — set
    * `spark.sql.adaptive.forceOptimizeSkewedJoin=true` when a corpus has
    * pathological cells; the extra exchange it buys is exactly the
    * straggler trade you want there. */
  def semanticDedupRemovals(
      embeddings: DataFrame, numCells: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("embedding"))
    val assigned = IvfKnn.assign(base, IvfKnn.centroids(base, numCells))
      .select(col("cell"), col("id"), col("embedding"),
        VectorFunctions.l2Norm(col("embedding")).as("nrm"))
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        round(VectorFunctions.dotProduct(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .groupBy(col("cell"), col("id_b").as("removed_id"))
      .agg(min(struct(col("id_a"), col("cosine_sim"))).as("kp"))
      .select(col("cell"), col("removed_id"),
        col("kp.id_a").as("kept_id"), col("kp.cosine_sim").as("cosine_sim"))
  }

}

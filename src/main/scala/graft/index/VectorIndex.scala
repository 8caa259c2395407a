package graft.index

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DistanceMetric
import graft.operators.TopK

/** Executor-local cache of rehydrated shard graphs, keyed by (index
  * identity, shard). Rebuilding the in-memory adjacency from IndexRows is
  * the dominant fixed cost of a probe; repeated probes (recall sweeps,
  * interactive batches) hit the cache instead. Bounded LRU; graphs carry
  * mutable search scratch, so probes synchronize on the instance (two
  * concurrent jobs may probe the same shard).
  */
object ShardGraphCache {
  // residency bound, overridable for decade-scale probes: resident
  // graphs + in-flight rehydration buffers must co-fit in the heap, so
  // a 128-shard 100M probe runs with this at ~the task concurrency
  // (graphs older than the running tasks only help if the same shard is
  // probed again before eviction — at soak shape each job touches each
  // shard exactly once, so a deep cache is pure heap pressure).
  // Read from the Spark conf first: this object initializes inside
  // EXECUTOR JVMs, where a driver-side -D flag never arrives, but the
  // SparkConf does (`--conf spark.graft.shardCache.maxEntries=N`). The
  // system property remains as the local-mode/script fallback.
  private val MaxEntries =
    Option(org.apache.spark.SparkEnv.get)
      .flatMap(_.conf.getOption("spark.graft.shardCache.maxEntries"))
      .orElse(sys.props.get("graft.shardCache.maxEntries"))
      .map(_.toInt).getOrElse(64)
  private val cache =
    new java.util.LinkedHashMap[(String, Int), SubIndexGraph](MaxEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), SubIndexGraph]): Boolean =
        size() > MaxEntries
    }

  def getOrRehydrate(indexId: String, shardId: Int)(make: => SubIndexGraph): SubIndexGraph = {
    val key = (indexId, shardId)
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) return hit
    // build OUTSIDE the lock: concurrent tasks rehydrate DISTINCT shards
    // (shard == partition), so holding the global lock through `make`
    // would serialize every shard rebuild behind one core. The rare
    // same-shard race (two concurrent query calls, both missing) builds
    // twice and keeps the first insert — benign, both are identical.
    val g = make
    cache.synchronized {
      val prior = cache.get(key)
      if (prior != null) prior else { cache.put(key, g); g }
    }
  }

  /** Cache lookup without building — lets the probe skip materializing a
    * shard's rows entirely when its graph is already resident. */
  def peek(indexId: String, shardId: Int): SubIndexGraph =
    cache.synchronized { cache.get((indexId, shardId)) }

  /** Drop every resident graph of one index generation FROM THIS JVM —
    * the heap half of RETIRING a snapshot (deleting its files frees
    * storage; this frees the graphs a retired generation still pins).
    * Scope honesty: the cache is per-JVM, so on a cluster this call
    * only affects the JVM it runs in; executor-resident graphs of a
    * retired generation age out via the cache's LRU bound (MaxEntries)
    * — the eviction there is pressure-driven, not immediate. In local
    * mode (driver == executor, the retirement spec's setting) this IS
    * the full eviction, which is what lets the spec force the next
    * probe to re-read the surviving snapshot's parquet and prove a
    * delete of the OLD generation never corrupts the NEW one
    * (hardlinked inodes stay alive). Returns the evicted count. */
  def evict(indexId: String): Int = cache.synchronized {
    val it = cache.keySet().iterator()
    var n = 0
    while (it.hasNext) if (it.next()._1 == indexId) { it.remove(); n += 1 }
    n
  }
}

/** One persisted index row: a vector plus its per-layer adjacency
  * (FIXTURES.md §4; arrays-of-structs instead of maps for encoder
  * friendliness). */
case class IndexRow(
    sub_index_id: Int,
    offset: Int,
    global_id: Long,
    layer: Int,
    embedding: Array[Float],
    out: Seq[Seq[OutEdge]],
    edges: Seq[Seq[EdgeRef]])

case class OutEdge(dist: Double, nbr: Int)
case class EdgeRef(nbr: Int, rc: Int)

/** Per-shard metadata (entry point etc. — reference: dehnsw.h:54-70). */
case class ShardMeta(sub_index_id: Int, n_vectors: Long, layer_count: Int, entry_offset: Int)

/** The MACHINE-READABLE half of a face's provenance: the artifact `path`
  * a serve of this face must open (the IVF-PQ codes snapshot, the
  * full-precision base store) plus small string `knobs` (pool size,
  * fetch mode, nprobe…). [[FacePoint.artifact]] stays free text for
  * measurement context (JVM co-residency, corpus notes) — this is the
  * part [[FaceServer]] dispatches on, so it must survive a JSON
  * round-trip structurally, not as prose. */
case class FaceArtifact(path: String, knobs: Map[String, String] = Map.empty) {
  private def esc(s: String) =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  /** Compact JSON object (keys sorted for deterministic bytes). */
  def toJson: String =
    s"""{"path":"${esc(path)}","knobs":{${
      knobs.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString(",")}}}"""
}

object FaceArtifact {
  private def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
  /** Parse [[FaceArtifact.toJson]] output; None on anything else. */
  def fromJson(json: String): Option[FaceArtifact] = {
    val strPair = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
    for {
      p <- """"path":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      kn <- VectorIndex.sliceBalanced(json, "knobs", '{', '}')
    } yield FaceArtifact(unesc(p.group(1)),
      strPair.findAllMatchIn(kn)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap)
  }
}

/** One measured serving FACE of a published index pair: `face` names the
  * serving path ("exact" = the index's own width-0 scan, "beam" = the
  * graph walk at searchWidth `param`, "refine" = an SQ8 pool at
  * searchWidth `param` exact-float-reranked against the base relation,
  * "ivfpq" = an ADC+rerank serve at nprobe `param` from a codes snapshot
  * published beside the graph), with its measured sample recall and warm
  * ms/query. The deployment decision SCALE.md documents is multi-way
  * (exact vs beam vs refined vs IVF-PQ, each a different
  * recall/latency/memory point) — persisting the measured table lets a
  * serving deployment pick a FACE, not just a width, from evidence.
  *
  * `artifact` records WHICH artifact and measurement conditions back the
  * point (codes-snapshot path + knobs, pool size, JVM co-residency…) —
  * empty for faces served by the snapshot the sidecar itself lives in.
  * `ref` is the structured counterpart ([[FaceArtifact]]: path + knobs)
  * that [[FaceServer.serve]] dispatches on — free text stays free text.
  * Pre-artifact (4-element) and pre-ref (5-element) sidecar entries
  * parse unchanged (both fields default empty). */
case class FacePoint(face: String, param: Int, recall: Double,
    msPerQuery: Double, artifact: String = "",
    ref: Option[FaceArtifact] = None)

/** A persisted width-calibration operating point (`calibration.json`
  * beside a snapshot's params.json): the production searchWidth chosen
  * by [[VectorIndex.calibrateWidthTo]], the target it met, k, the chosen
  * width's sample recall, and the full (width, recall) curve for the
  * record. `faces` (optional — empty on width-only calibrations and on
  * every pre-face sidecar, which parse unchanged) is the measured
  * cross-face table ([[FacePoint]]). */
case class WidthCalibration(searchWidth: Int, targetRecall: Double, k: Int,
    sampleRecall: Double, curve: Seq[(Int, Double)],
    faces: Seq[FacePoint] = Nil) {

  /** The cheapest measured face meeting `target` (min ms/query, ties by
    * face name then param for determinism); None when no face qualifies
    * or no face table was persisted — callers fall back to the
    * width-based operating point. */
  def bestFace(target: Double): Option[FacePoint] =
    faces.filter(_.recall >= target)
      .sortBy(f => (f.msPerQuery, f.face, f.param)).headOption
}

/** Distributed dehnsw index: shard == Spark partition (SURVEY §1.3).
  *
  * Build: deterministic shard assignment (`global_id % numShards` — unlike
  * the reference's insertion-order chunking, dehnsw.h:601, but equally
  * deterministic and shuffle-friendly), graph built partition-locally in
  * insertion order of ascending id. Parallel across shards — better than
  * the reference, which builds shards sequentially.
  *
  * Query: broadcast the query batch, probe every shard (the *intended*
  * multi-shard semantics of the commented `query_with_sub_index`,
  * dehnsw.h:532-587), then one partial/final top-k merge instead of the
  * reference's sequential distance-bound (deliberate divergence, SURVEY
  * §2.1 O7 — a shared bound would serialize shard visits).
  *
  * Scale notes: each task holds one shard's adjacency (size subIndexBound —
  * pick it from executor memory); candidates shuffled are O(queries x
  * shards x k) via TopKByDistance, never O(rows).
  */
class VectorIndex private (
    val params: IndexParams,
    val numShards: Int,
    val rows: Dataset[IndexRow],
    val meta: Array[ShardMeta],
    /** Stable identity for executor-side graph caching (fresh per build,
      * persisted with the index). */
    val indexId: String) extends Serializable with AnnProbe {

  override def probeId: String = indexId
  override def probeMetric: graft.functions.DistanceMetric = params.metric
  override def probeNormalized: Boolean = params.transformsInput
  override def probeSemanticMetric: graft.functions.DistanceMetric =
    if (params.normalizeForCosine) DistanceMetric.Cosine
    else if (params.augmentForMips) DistanceMetric.InnerProduct
    else params.metric
  override def probeSession: SparkSession = rows.sparkSession
  override def probeBatch(
      batch: Array[(Long, Array[Float])], k: Int, searchWidth: Int): DataFrame =
    queryBatch(batch, k, searchWidth)
  override def probeDescription: String = s"shards=$numShards"

  /** Vector dimension, read once from the first index row and reused by
    * every append (one fewer job per call). Only valid when the index is
    * non-empty — callers guard on meta.nonEmpty. */
  @transient lazy val dimension: Int =
    rows.select(size(col("embedding"))).head.getInt(0)

  /** Batch kNN probe. searchWidth (= the reference's query-RM,
    * dehnsw.h:300-307): 0 = exact (per-shard brute-force scan — guaranteed
    * exhaustive, a strict strengthening of the reference's
    * connected-component walk); > 0 = ANN beam with early termination.
    * Returns (query_id, rank, neighbor_id, distance). */
  /** @param maxBatch query vectors broadcast per pass; bigger batches are
    *                 chunked so a single broadcast never exceeds
    *                 maxBatch x dim floats (executor-memory safety at
    *                 scale), with all chunks merged in one final top-k. */
  def query(queries: DataFrame, k: Int, searchWidth: Int, maxBatch: Int = 100000): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val qds = queries
      .select(col("query_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    // routing probe collects ONLY ids (column-pruned scan, 8 bytes/row
    // bounded at maxBatch+1) — collecting whole rows here would ship up
    // to maxBatch query VECTORS to the driver just to count them. Small
    // batches then pay one more (full) collect; big batches never
    // transit the driver at all — the driverless shuffled probe is also
    // ~3x faster than chunked broadcasts at 200k queries.
    val probeCount = qds.select(col("query_id")).limit(maxBatch + 1).count()
    if (probeCount <= maxBatch) queryBatch(qds.collect().sortBy(_._1), k, searchWidth, maxBatch)
    else queryDistributed(queries, k, searchWidth)
  }

  /** Two-stage REFINED probe — the quantization-ceiling breaker: stage 1
    * pulls a per-query pool of `pool` candidates from this index
    * ([[query]] at `searchWidth`; width 0 = the exact SQ8 scan), stage 2
    * re-scores only the pool with FULL-PRECISION vectors from `base`
    * (the raw (id, embedding) relation this index was built from) and
    * keeps the top k ([[graft.operators.RefineKnn.refine]], scored with
    * the index's SEMANTIC metric on raw vectors). An SQ8 index's beam
    * or exact scan is capped by its code resolution (the 100M decade
    * ceiling: 0.959 recall@10 — SCALE.md); refinement only needs the
    * true neighbors inside the top-`pool`, so the ceiling lifts to
    * ~P(true k-NN ⊆ SQ8 top-pool) — near 1 for pool >> k.
    *
    * Cost at scale: one bounded broadcast (|queries| × pool ids) + one
    * column-pruned pass over `base` per query BATCH — amortized, and
    * cheaper per row than a distance eval (hash probe vs 2·dim FLOPs).
    *
    * CONTRACT: `base` must be the relation this index was built from
    * (or a superset) — a pool id missing from `base` is silently
    * dropped by the rerank's inner join ([[graft.operators.RefineKnn
    * .refine]]), degrading to fewer-than-k rows or shifted ranks with
    * no error. Pass `requireCoverage = true` when the base comes from
    * an external store whose freshness is not guaranteed by
    * construction: coverage is then asserted (one extra count over the
    * bounded scored pool) and a stale base throws instead. */
  def queryRefined(queries: DataFrame, base: DataFrame, k: Int, pool: Int,
      searchWidth: Int, maxBatch: Int = 100000,
      requireCoverage: Boolean = false): DataFrame = {
    require(pool >= k, s"refine pool $pool must be >= k=$k")
    graft.operators.RefineKnn.refine(
      query(queries, pool, searchWidth, maxBatch)
        .select(col("query_id"), col("neighbor_id")),
      queries, base, k, probeSemanticMetric, requireCoverage)
  }

  /** [[queryRefined]] with the rerank base read from a PUBLISHED
    * [[graft.sources.BaseStore]] — the deployment shape, where the
    * build corpus is not a live relation. `fetch` picks the store read:
    *  - "point": pin the bounded stage-1 pool, collect its distinct ids
    *    (≤ |queries| × pool longs) and page-pruned-read only those rows
    *    ([[graft.sources.BaseStore.fetch]]) — rerank I/O scales with
    *    the POOL, the serving default;
    *  - "scan": stream the whole store once, column-pruned, semi-joined
    *    against the broadcast pool — wins only when the batch is so
    *    large the pool touches most pages anyway.
    * Coverage is always asserted (a store that has drifted from the
    * index must throw, not silently return fewer neighbors). */
  def queryRefinedFromStore(queries: DataFrame, storePath: String, k: Int,
      pool: Int, searchWidth: Int, fetch: String = "auto",
      maxBatch: Int = 100000): DataFrame = {
    require(pool >= k, s"refine pool $pool must be >= k=$k")
    val spark = rows.sparkSession
    // "auto": the measured crossover ([[graft.sources.BaseStore
    // .pointWins]]) — point fetch for small pools, the batch-amortized
    // full-store scan once the pool id set would touch enough vector
    // pages that per-hit page decodes cost more than one pass
    val mode =
      if (fetch != "auto") fetch
      else {
        // |Q|×pool bounds the distinct pool ids without running stage 1
        val nIds = queries.count() * pool
        if (graft.sources.BaseStore.pointWins(spark, storePath, nIds))
          "point"
        else "scan"
      }
    mode match {
      case "scan" =>
        queryRefined(queries,
          graft.sources.BaseStore.relation(spark, storePath), k, pool,
          searchWidth, maxBatch, requireCoverage = true)
      case "point" =>
        // pin the pool so the probe runs once, not once per consumer
        // (ids collect + rerank join)
        val stage1 = query(queries, pool, searchWidth, maxBatch)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
        val ids = stage1.select(col("neighbor_id")).distinct()
          .collect().map(_.getLong(0)).toSeq
        graft.operators.RefineKnn.refine(stage1, queries,
          graft.sources.BaseStore.fetch(spark, storePath, ids), k,
          probeSemanticMetric, requireCoverage = true)
      case other => sys.error(
        s"queryRefinedFromStore: unknown fetch mode '$other' (auto|point|scan)")
    }
  }

  /** Query vectors transformed iff the index transforms at its API
    * boundary (cosine normalization / MIPS zero-augmentation) — the
    * probe-side half of the contract (corpus rows were transformed once
    * at build/append ingest). */
  @inline private def normalizeQuery(v: Array[Float]): Array[Float] =
    params.transformQueryVector(v)

  /** Probe with an already-materialized query batch (no collect) — used by
    * the optimizer rewrite, where the query vector is a plan literal. */
  def queryBatch(
      queryBatch: Array[(Long, Array[Float])], k: Int, searchWidth: Int,
      maxBatch: Int = 100000): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    if (queryBatch.isEmpty) {
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "distance")
    }
    val bcMeta = spark.sparkContext.broadcast(meta.map(m => m.sub_index_id -> m).toMap)
    val p = params
    val iid = indexId
    val normBatch = queryBatch.map { case (id, v) => (id, normalizeQuery(v)) }

    val candidateChunks = normBatch.grouped(math.max(maxBatch, 1)).map { chunk =>
      val bcQueries = spark.sparkContext.broadcast(chunk)
      val rdd = probeLayout.mapPartitions { rit =>
        // partition index == shard id; when the shard's graph is already
        // resident in the executor cache, its rows are simply never
        // consumed (cached blocks — skipping costs nothing)
        val shardId = org.apache.spark.TaskContext.getPartitionId()
        VectorIndex.probePartition(
          rit, iid, shardId, p, bcMeta.value, bcQueries.value, k, searchWidth)
      }
      spark.createDataset(rdd).toDF("query_id", "distance", "neighbor_id")
    }.toSeq

    TopK.topKMerge(candidateChunks.reduce(_ union _), k)
  }

  /** Probe the same query batch at SEVERAL beam widths in one pass —
    * the recall-sweep shape (v8 oracle, [[graft.Sweep]]): per shard the
    * graph is locked once and every (query, width) pair probes the
    * resident graph back to back, so a W-width sweep costs one job and
    * one shard-cache pass instead of W full probe jobs. Output adds a
    * leading `search_width` column to the [[query]] schema. Widths <= 0
    * mean exact (same contract as [[query]]). */
  def queryBatchMultiWidth(
      batch: Array[(Long, Array[Float])], k: Int, widths: Seq[Int],
      maxBatch: Int = 100000): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val w = widths.length
    require(w >= 1, "need at least one width")
    require(batch.forall(_._1 >= 0), "multi-width probe requires non-negative query ids")
    if (batch.isEmpty) {
      return spark.emptyDataset[(Int, Long, Int, Long, Double)]
        .toDF("search_width", "query_id", "rank", "neighbor_id", "distance")
    }
    val bcMeta = spark.sparkContext.broadcast(meta.map(m => m.sub_index_id -> m).toMap)
    val p = params
    val iid = indexId
    val widthArr = widths.toArray
    val normed = batch.map { case (id, v) => (id, normalizeQuery(v)) }
    // width index rides in the low bits of a synthetic query id so the
    // per-(query, width) top-k merge reuses the scalar machinery
    val candidateChunks = normed.grouped(math.max(maxBatch, 1)).map { chunk =>
      val bcQueries = spark.sparkContext.broadcast(chunk)
      val rdd = probeLayout.mapPartitions { rit =>
        val shardId = org.apache.spark.TaskContext.getPartitionId()
        val g = VectorIndex.shardGraphFor(rit, iid, shardId, p, bcMeta.value)
        if (g == null) Iterator.empty
        else {
          val graph = g
          graph.synchronized {
            bcQueries.value.toArray.flatMap { case (qid, qvec) =>
              widthArr.indices.flatMap { wi =>
                val sw = widthArr(wi)
                val topk =
                  if (sw <= 0) graph.bruteForceTopK(qvec, k)
                  else graph.queryTopK(qvec, k, sw)
                topk.map { case (d, gid) => (qid * w + wi, d, gid) }
              }
            }.iterator
          }
        }
      }
      spark.createDataset(rdd).toDF("query_id", "distance", "neighbor_id")
    }.toSeq
    TopK.topKMerge(candidateChunks.reduce(_ union _), k)
      .select(
        element_at(typedLit(widthArr), (col("query_id") % w).cast("int") + 1)
          .as("search_width"),
        (col("query_id") / w).cast("long").as("query_id"),
        col("rank"), col("neighbor_id"), col("distance"))
  }

  /** Width AUTO-calibration — the reference's manual parameter sweep
    * (example/dehnsw_example.cpp:96-130) made self-driving: probe a
    * bounded sample of queries at every candidate width AND width 0 (the
    * index's own exact scan — for a quantized index that is the
    * quantization ceiling, i.e. the best any beam can do) in ONE
    * [[queryBatchMultiWidth]] pass, score each width with the reference's
    * tie-tolerant rank-wise distance compare (E2 semantics —
    * [[graft.operators.RecallEval.recallByQuery]]), and return the
    * SMALLEST width whose sample recall meets `targetRecall`, plus the
    * full (width, recall) curve for the record.
    *
    * Returns width 0 — "serve exact" ([[query]]'s `searchWidth <= 0`
    * contract) — when no candidate width meets the target: the honest
    * fallback, since exact scan trivially meets any target the index
    * can meet at all.
    *
    * 100 TB shape: the sample is bounded by contract (|sample| × k ×
    * |widths| result rows transit the driver — nothing corpus-sized),
    * the sweep costs one shard-rehydration cycle, and exact ground
    * truth is exactly one more width in the same pass (measured at the
    * decade: brute force over 100M×64d for 100 queries is 29 s —
    * brute force IS cheap as a calibrator, SCALE.md). */
  def calibrateWidth(sample: Array[(Long, Array[Float])], k: Int,
      targetRecall: Double,
      widths: Seq[Int] = Seq(2, 4, 8, 16, 32, 64, 128, 256, 512))
      : (Int, Seq[(Int, Double)]) = {
    require(sample.nonEmpty, "calibrateWidth needs a non-empty sample")
    require(targetRecall >= 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in [0, 1], got $targetRecall")
    val ws = widths.filter(_ > 0).distinct.sorted
    require(ws.nonEmpty, "calibrateWidth needs at least one positive width")
    val probe = queryBatchMultiWidth(sample, k, 0 +: ws)
      .select(col("search_width"), col("query_id"), col("rank"), col("distance"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val (hits, denom) = VectorIndex.tieTolerantWidthHits(probe)
    // an empty/probeless index yields no width-0 ground-truth rows; a
    // silent all-NaN curve would "choose" width 0 for a meaningless
    // calibration — surface it instead
    require(denom > 0,
      "calibrateWidth: the exact (width 0) probe returned no rows — " +
        "empty index or unprobeable sample")
    val curve = ws.map(w => w -> hits(w).toDouble / denom)
    (curve.find(_._2 >= targetRecall).map(_._1).getOrElse(0), curve)
  }

  /** [[calibrateWidth]] + persist the chosen operating point INTO the
    * snapshot at `path` (a `calibration.json` sidecar beside
    * params.json): the width, target, k, the chosen width's sample
    * recall, and the full curve — so a serving deployment
    * ([[graft.ProbeBench]] width `auto`, [[graft.operators
    * .HybridRetrieval.serveFromSnapshots]] with
    * `searchWidth = VectorIndex.CalibratedWidth`) defaults to the
    * calibrated width instead of re-deriving or hard-coding it. Width 0
    * (the exact-scan fallback) records sample recall 1.0 by
    * construction. */
  def calibrateWidthTo(path: String, sample: Array[(Long, Array[Float])],
      k: Int, targetRecall: Double,
      widths: Seq[Int] = Seq(2, 4, 8, 16, 32, 64, 128, 256, 512))
      : (Int, Seq[(Int, Double)]) = {
    val (w, curve) = calibrateWidth(sample, k, targetRecall, widths)
    val sampleRecall = curve.find(_._1 == w).map(_._2).getOrElse(1.0)
    VectorIndex.writeCalibration(rows.sparkSession, path,
      WidthCalibration(w, targetRecall, k, sampleRecall, curve))
    (w, curve)
  }

  /** Probe-ready layout shared by the broadcast and shuffled probes:
    * partition i holds exactly shard i's rows (ShardPartitioner maps the
    * shard id to itself), cached ONCE per index — the exchange happens on
    * first probe, not once per query call, and both probe paths read the
    * same cached blocks. */
  /** Set by [[VectorIndex.load]] when the snapshot carries a
    * [[VectorIndex.relayoutSharded]] layout — [[probeLayout]] then
    * builds shard-aligned partitions by a NARROW scan instead of the
    * corpus-sized shuffle. */
  @transient private[graft] var shardedLayoutDir: Option[String] = None

  @transient private[graft] lazy val probeLayout
      : org.apache.spark.rdd.RDD[IndexRow] = {
    // FAST PATH — dir-sharded snapshot layout (rows_sharded/, one file
    // per shard): the probe layout is a narrow aligned scan, NOT a
    // shuffle. The legacy partitionBy below moves ~2.5x the snapshot's
    // parquet bytes through shuffle storage on EVERY serving process's
    // first probe (51 GB measured for the 100M M=8 snapshot — the
    // whole index, re-serialized row-wise); with the sharded layout a
    // load-then-probe touches only the parquet it actually reads.
    val aligned = shardedLayoutDir.flatMap(dir =>
      VectorIndex.alignedLayout(rows.sparkSession, dir, numShards))
    val rdd = aligned.getOrElse {
      rows.rdd.map(r => (r.sub_index_id, r))
        .partitionBy(new VectorIndex.ShardPartitioner(numShards))
        .map(_._2)
    }
    // `spark.graft.probeLayoutStorage` = NONE drops the layout cache for
    // corpus-scale LOADED indexes: the rehydrated shard graphs live in
    // ShardGraphCache after the first probe pass anyway, so the cached
    // row blocks are a second full on-disk/heap copy of an index whose
    // authoritative copy is already compressed parquet — exactly the
    // copy that exhausted the local disk pool in the 100M probe
    // (SCALE.md). Repeat probes still skip the map stage: the same RDD
    // instance reuses its shuffle files.
    val lvl = rows.sparkSession.conf
      .get("spark.graft.probeLayoutStorage", "MEMORY_ONLY")
    if (lvl.equalsIgnoreCase("NONE")) rdd
    else rdd.persist(org.apache.spark.storage.StorageLevel.fromString(lvl))
  }

  /** Fully driverless probe: query rows flow through ONE shuffle onto the
    * identity-partitioned index layout — no driver collect, no broadcast,
    * no `toLocalIterator` transit, so the batch may be arbitrarily large
    * (each task holds one shard's graph plus a bounded query group).
    * Each query is replicated to every shard (the same data volume a
    * broadcast ships to every executor), probed per shard, and reduced by
    * the usual partial/final top-k merge. Results are identical to
    * [[query]] — gated by spec. Prefer [[query]] for small batches (one
    * broadcast beats a |Q| x shards shuffle when |Q| is tiny). */
  def queryDistributed(queries: DataFrame, k: Int, searchWidth: Int,
      live: Long => Boolean = null): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val n = numShards
    val bcMeta = spark.sparkContext.broadcast(meta.map(m => m.sub_index_id -> m).toMap)
    val p = params
    val iid = indexId
    val qPairs = queries
      .select(col("query_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].rdd
      .map { case (id, v) => (id, p.transformQueryVector(v)) }
      .flatMap(q => Iterator.range(0, n).map(s => (s, q)))
      .partitionBy(new VectorIndex.ShardPartitioner(n))
      .map(_._2)
    val candidates = probeLayout.zipPartitions(qPairs, preservesPartitioning = false) {
      (rit, qit) =>
        if (!qit.hasNext) Iterator.empty
        else {
          val shardId = org.apache.spark.TaskContext.getPartitionId()
          val g = VectorIndex.shardGraphFor(rit, iid, shardId, p, bcMeta.value)
          if (g == null) Iterator.empty // shard holds no vectors
          else {
            val graph = g
            // bounded groups keep per-task result memory ~groupSize x k
            // while still materializing each group's probes inside the
            // graph lock (the iterator must not escape the lock lazily)
            qit.grouped(2048).flatMap { group =>
              graph.synchronized {
                group.iterator.flatMap { case (qid, qvec) =>
                  val topk =
                    if (searchWidth <= 0) graph.bruteForceTopK(qvec, k, live)
                    else graph.queryTopK(qvec, k, searchWidth, live)
                  topk.iterator.map { case (d, gid) => (qid, (d, gid)) }
                }.toArray
              }
            }
          }
        }
    }
    // Reduce-side-only top-k merge. A map-side partial top-k is pure
    // overhead here: each probe task already emits AT MOST k candidates
    // per (query, shard), so partial aggregation shrinks nothing — it
    // only materializes |queries-in-task| aggregation state (at 10^6
    // queries that is a million-key hash map per task, which falls back
    // to sort-based aggregation over the full candidate stream and OOMs
    // long before the shuffle would). With mapSideCombine=false the
    // candidate rows stream straight into the shuffle writer, and the
    // reduce side builds one bounded TopKBuffer per query — memory
    // O(queries-per-reduce-task x k), independent of shard count.
    val mergeParts = math.max(
      spark.conf.get("spark.sql.shuffle.partitions", n.toString).toInt, n)
    val merged = candidates
      .combineByKeyWithClassTag[graft.operators.TopKBuffer](
        createCombiner = (v: (Double, Long)) => {
          val b = new graft.operators.TopKBuffer(k); b.insert(v._1, v._2); b
        },
        mergeValue = (b: graft.operators.TopKBuffer, v: (Double, Long)) => {
          b.insert(v._1, v._2); b
        },
        mergeCombiners = (a: graft.operators.TopKBuffer, b: graft.operators.TopKBuffer) => {
          a.merge(b); a
        },
        partitioner = new org.apache.spark.HashPartitioner(mergeParts),
        mapSideCombine = false)
      .flatMap { case (qid, buf) =>
        buf.sortedPairs.iterator.zipWithIndex.map {
          case ((d, gid), i) => (qid, i + 1, gid, d)
        }
      }
    merged.toDF("query_id", "rank", "neighbor_id", "distance")
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("distance"))
  }

  /** Batch append: rebuild only the shards that receive new vectors
    * (SURVEY §1.3 — online single-vector insert is out of scope; batch
    * append = partition rebuild). Because shard assignment is id % shards
    * and the kernel is deterministic in ascending-id insertion order, the
    * result is IDENTICAL to rebuilding the whole index from the union of
    * old and new vectors — untouched shards' rows are reused as-is.
    *
    * New ids must be disjoint from existing ones and from each other
    * (validated), and dimensions must match the index (validated).
    * Returns a new index with a fresh cache identity — EXCEPT for an
    * empty batch, which returns this index unchanged (no copy). The old
    * index stays valid and keeps its caches; drop them with [[unpersist]]
    * when a superseded generation is no longer needed. */
  def append(newVectors: DataFrame): VectorIndex =
    appendImpl(newVectors, normalize = true)

  /** [[append]] for INTERNALLY RECOVERED vectors — LSM compaction folds
    * generation rows that were already normalized at their original
    * ingest (or, quantized, are byte-stable dequantized midpoints);
    * re-normalizing them would drift last bits and break the
    * compaction-preserves-probes / append==rebuild invariants. */
  private[index] def appendRecovered(newVectors: DataFrame): VectorIndex =
    appendImpl(newVectors, normalize = false)

  /** Shared discover/recover/validate front half of [[appendImpl]] and
    * [[VectorIndex.appendTo]]: the normalized fresh batch (CACHED — it
    * is evaluated for shard discovery AND the rebuild, and a
    * nondeterministic source re-evaluating differently would corrupt the
    * shard/row bookkeeping), the affected shard ids, and the
    * affected-slice ∪ fresh rebuild input, with the dimension and
    * id-disjointness contract enforced in one aggregation pass (a
    * clashing id necessarily hashes into an affected shard, so the
    * distinctness check covers old-vs-new AND new-vs-new clashes;
    * `existing` is recovered from index rows and must NOT re-normalize).
    * An empty batch returns (fresh, Nil, null). Callers differ only in
    * the rebuilt-rows SINK (in-memory cache vs parquet write) and
    * unpersist `fresh` when done. */
  private[index] def appendPrep(newVectors: DataFrame, normalize: Boolean,
      cacheInput: Boolean): (DataFrame, Seq[Int], DataFrame) = {
    val spark = rows.sparkSession
    import spark.implicits._
    val selected = newVectors.select(col("id").cast("long"), col("embedding"))
    val fresh = (if (normalize) VectorIndex.normalizeInput(selected, params)
                 else selected).cache()
    val affected = fresh
      .select(VectorIndex.shardOf(col("id"), numShards).as("s"))
      .distinct().as[Int].collect().toSet
    if (affected.isEmpty) return (fresh, Nil, null)
    val affectedSeq = affected.toSeq
    val existing = rows
      .filter(col("sub_index_id").isin(affectedSeq: _*))
      .select(col("global_id").as("id"), col("embedding"))
    val rebuildInput0 = existing.union(fresh)
    val rebuildInput = if (cacheInput) rebuildInput0.cache() else rebuildInput0
    // one validation pass: total/distinct counts + dimension mismatches
    // (existing rows always match, so counting over the union is the same
    // check as counting over fresh alone — in the same job). A failed
    // validation unpersists before throwing — a caller that catches and
    // retries must not accumulate orphaned cached batches.
    try {
      val dim = if (meta.nonEmpty) dimension else -1
      val counts = rebuildInput
        .agg(count(lit(1)), count_distinct(col("id")),
          count(when(lit(dim >= 0) && size(col("embedding")) =!= dim, 1))).head
      val (nIn, nDistinct, badDim) = (counts.getLong(0), counts.getLong(1), counts.getLong(2))
      require(badDim == 0,
        s"appended vectors must match index dimension $dim ($badDim mismatching rows)")
      require(nIn == nDistinct,
        s"appended ids must be disjoint from the index and unique (${nIn - nDistinct} clashes)")
    } catch { case t: Throwable =>
      fresh.unpersist()
      if (cacheInput) rebuildInput.unpersist()
      throw t
    }
    (fresh, affectedSeq, rebuildInput)
  }

  private def appendImpl(newVectors: DataFrame, normalize: Boolean): VectorIndex = {
    val spark = rows.sparkSession
    import spark.implicits._
    val (fresh, affectedSeq, rebuildInput) =
      appendPrep(newVectors, normalize, cacheInput = true)
    if (affectedSeq.isEmpty) { fresh.unpersist(); return this }
    val affected = affectedSeq.toSet
    val rebuilt = VectorIndex.buildRows(rebuildInput, params, numShards)
    val kept = rows.filter(!col("sub_index_id").isin(affectedSeq: _*))
    val cached = kept.union(rebuilt).cache()
    // untouched shards keep their meta verbatim; recompute only the
    // rebuilt shards (one pass over the affected slice of the cached
    // union, which also materializes it — not the whole index)
    val rebuiltMeta = VectorIndex.computeMeta(
      cached.filter(col("sub_index_id").isin(affectedSeq: _*)))
    cached.count() // materialize the kept slice too before dropping inputs
    val meta2 = (meta.filterNot(m => affected(m.sub_index_id)) ++ rebuiltMeta)
      .sortBy(_.sub_index_id)
    fresh.unpersist()
    rebuildInput.unpersist()
    new VectorIndex(params, numShards, cached, meta2,
      java.util.UUID.randomUUID().toString)
  }

  /** Shard-scoped physical DELETE — the lifecycle face the reference
    * lacks entirely (its API stops at insert/query/optimize/save):
    * rebuild ONLY the shards owning a removed id, exactly [[append]]'s
    * economics in reverse. Ids are routed to shards by the same pure
    * id->shard hash, so survivors keep their shard and untouched shards
    * keep rows AND meta verbatim; a shard emptied by removal simply
    * drops out of meta (probes of an empty shard return nothing by
    * construction). Removing an id that is not in the index is a no-op
    * for that id — deletes are idempotent, the LSM contract upstream
    * relies on it. Input: one `id LONG` column. */
  def remove(removeIds: DataFrame): VectorIndex = {
    val spark = rows.sparkSession
    import spark.implicits._
    val ids = removeIds.select(col("id").cast("long")).distinct().cache()
    // only ids actually PRESENT can change a shard: hashing the raw
    // request set would rebuild shards that lose nothing (e.g. LSM
    // tombstones for fresh-generation ids that never reached this base —
    // deletes are idempotent, so absent ids are legal and common).
    // Command-sized delete batches broadcast (one semi-join, no corpus
    // shuffle); a corpus-scale removal set would blow the broadcast /
    // driver heap, so above the threshold the semi-join is left to plan
    // as a shuffle — 8 bytes/id keys exchange, never the vectors.
    val nIds = ids.count()
    val idsSide = if (nIds <= 1000000L) broadcast(ids) else ids
    val affected = rows.toDF().select(col("global_id").as("id"))
      .join(idsSide, Seq("id"), "left_semi")
      .select(VectorIndex.shardOf(col("id"), numShards).as("s"))
      .distinct().as[Int].collect().toSet
    if (affected.isEmpty) { ids.unpersist(); return this }
    val affectedSeq = affected.toSeq
    val surviving = rows
      .filter(col("sub_index_id").isin(affectedSeq: _*))
      .select(col("global_id").as("id"), col("embedding"))
      .join(ids, Seq("id"), "left_anti")
      .cache()
    val rebuilt = VectorIndex.buildRows(surviving, params, numShards)
    val kept = rows.filter(!col("sub_index_id").isin(affectedSeq: _*))
    val cached = kept.union(rebuilt).cache()
    val rebuiltMeta = VectorIndex.computeMeta(
      cached.filter(col("sub_index_id").isin(affectedSeq: _*)))
    cached.count() // materialize before dropping inputs
    val meta2 = (meta.filterNot(m => affected(m.sub_index_id)) ++ rebuiltMeta)
      .sortBy(_.sub_index_id)
    ids.unpersist()
    surviving.unpersist()
    new VectorIndex(params, numShards, cached, meta2,
      java.util.UUID.randomUUID().toString)
  }

  /** Drop this index's cached data (rows + probe layout). Call on a
    * superseded generation after [[append]] — each generation caches the
    * full row set, so long ingest loops must release old ones. */
  def unpersist(): Unit = {
    probeLayout.unpersist(false)
    rows.unpersist()
  }

  /** Materialize the index — the engine-side A5 `optimize` (reference:
    * python_binding/dehnswpy.cpp:18-21, a deep-copy compaction no-op that
    * exists to settle memory after build): forces the cached rows to
    * compute so later probes pay no build cost. Returns this index,
    * mirroring the reference's returned copy. */
  def optimize(): VectorIndex = { rows.count(); probeLayout.count(); this }

  /** Persist index rows + shard meta + params (reference save/load
    * round-trip invariant: dehnsw.h:666-844, exercised at
    * dehnsw_example.cpp:208-228). */
  def save(path: String): Unit = {
    rows.write.mode("overwrite").parquet(s"$path/rows")
    VectorIndex.writeMetaAndParams(
      rows.sparkSession, path, meta, params, numShards, indexId)
  }
}

object VectorIndex {

  /** Tie-tolerant rank-wise width scoring shared by [[VectorIndex
    * .calibrateWidth]], the v59 gate, and CalibrateWidthSpec — ONE
    * implementation of the E2 hit rule so the production operator, the
    * pinned oracle, and the spec cannot silently diverge. `probe` is
    * the collected rows of one [[VectorIndex.queryBatchMultiWidth]]
    * pass that INCLUDED width 0 (the exact leg): a width-w row hits
    * when its distance is <= the width-0 distance at the same
    * (query, rank). Returns (per-width hit counts, ground-truth row
    * count). */
  private[graft] def tieTolerantWidthHits(
      probe: Array[(Int, Long, Int, Double)]): (Map[Int, Int], Int) = {
    val gt = probe.collect { case (0, q, r, d) => (q, r) -> d }.toMap
    val hits = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    probe.foreach { case (w, q, r, d) =>
      if (w != 0 && gt.get((q, r)).exists(d <= _)) hits(w) += 1
    }
    (hits.toMap.withDefaultValue(0), gt.size)
  }

  /** One shard's probe: rehydrate (or cache-hit) the graph from the
    * partition's rows and run every query of the broadcast batch against
    * it — the per-partition body shared by the broadcast probe and the
    * fused multi-member LSM probe. The graph carries reusable search
    * scratch, so probes serialize on it and materialize INSIDE the lock
    * (a lazy iterator would escape it). */
  /** Resolve the resident graph for a shard, rehydrating STREAMING from
    * the row iterator on a cache miss (one row live at a time — never a
    * materialized row buffer beside the graph; the buffered form OOM'd
    * the 128-shard 100M probe). Returns null for a shard that holds no
    * vectors. When the graph is already resident the iterator is left
    * unconsumed — skipping costs nothing. */
  private[index] def shardGraphFor(
      rit: Iterator[IndexRow], iid: String, shardId: Int, params: IndexParams,
      metaMap: Map[Int, ShardMeta]): SubIndexGraph = {
    val cached = ShardGraphCache.peek(iid, shardId)
    if (cached != null) return cached
    metaMap.get(shardId) match {
      case None =>
        require(rit.isEmpty, s"shard $shardId has rows but no meta entry")
        null
      case Some(m) =>
        if (rit.isEmpty) {
          require(m.n_vectors == 0,
            s"shard $shardId: empty partition, meta says ${m.n_vectors} rows")
          null
        } else ShardGraphCache.getOrRehydrate(iid, shardId)(
          rehydrateStreaming(params, m, m.n_vectors.toInt, rit))
    }
  }

  private[index] def probePartition(
      rit: Iterator[IndexRow], iid: String, shardId: Int, params: IndexParams,
      metaMap: Map[Int, ShardMeta], queries: Array[(Long, Array[Float])],
      k: Int, searchWidth: Int,
      live: Long => Boolean = null): Iterator[(Long, Double, Long)] = {
    val g = shardGraphFor(rit, iid, shardId, params, metaMap)
    if (g == null) Iterator.empty // shard holds no vectors
    else {
      val graph = g
      graph.synchronized {
        queries.toArray.flatMap { case (qid, qvec) =>
          val topk =
            if (searchWidth <= 0) graph.bruteForceTopK(qvec, k, live)
            else graph.queryTopK(qvec, k, searchWidth, live)
          topk.map { case (d, gid) => (qid, d, gid) }
        }.iterator
      }
    }
  }

  /** Small-file IO through the Hadoop FS API so index metadata lands on
    * the SAME filesystem as the parquet rows (hdfs://, s3a://, file:...) —
    * java.nio would silently write a driver-local path for remote URIs. */
  private[graft] def writeSmallFile(
      spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Hardlink `src` to `dst` when both ends are local filesystems (zero
    * bytes moved), else a FileSystem copy — which on object stores is
    * the server-side-copy fast path. The kept-file discipline shared by
    * [[appendTo]] and [[graft.operators.HybridRetrieval.appendBm25]]. */
  private[graft] def linkOrCopyFile(
      fs: org.apache.hadoop.fs.FileSystem, src: org.apache.hadoop.fs.Path,
      dstFs: org.apache.hadoop.fs.FileSystem, dst: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val linked = fs.getScheme == "file" && dstFs.getScheme == "file" && (try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.Paths.get(src.toUri.getPath)); true
    } catch { case _: Exception => false })
    if (!linked) org.apache.hadoop.fs.FileUtil.copy(fs, src, dstFs, dst, false, conf)
  }

  /** Reject two path strings that alias the SAME location (relative vs
    * absolute, ".", scheme-default spellings): publishing a "new"
    * snapshot over its own source would destroy the rows mid-read. Same
    * string on two different stores is legal. Shared by the append
    * publishers. */
  private[graft] def requireDistinctPaths(
      hconf: org.apache.hadoop.conf.Configuration, oldPath: String,
      newPath: String, op: String): Unit = {
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).makeQualified(hp)
    }
    require(qualified(oldPath) != qualified(newPath),
      s"$op publishes a NEW snapshot: newPath must differ from oldPath")
  }

  /** Sentinel searchWidth for "use the snapshot's persisted calibration"
    * ([[WidthCalibration]]) — consumed by [[graft.operators
    * .HybridRetrieval.serveFromSnapshots]] and graft.ProbeBench. */
  val CalibratedWidth: Int = Int.MinValue

  /** Persist a [[WidthCalibration]] beside a snapshot's params.json.
    * Doubles serialize via toString (shortest round-trip — reparsing
    * yields identical bits). */
  def writeCalibration(spark: SparkSession, path: String,
      cal: WidthCalibration): Unit =
    writeSmallFile(spark, s"$path/calibration.json",
      s"""{"search_width":${cal.searchWidth},""" +
        s""""target_recall":${cal.targetRecall},"k":${cal.k},""" +
        s""""sample_recall":${cal.sampleRecall},""" +
        s""""curve":[${cal.curve.map(c => s"[${c._1},${c._2}]").mkString(",")}]""" +
        (if (cal.faces.isEmpty) "}"
         else s""","faces":[${cal.faces.map { f =>
             def q(s: String) =
               "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
             // the structured ref rides as a 7th/6th ESCAPED-JSON string
             // element (same escaping as the free-text artifact — the
             // reader's quoted-group regex handles both); a ref with an
             // empty artifact still writes the artifact slot so element
             // positions stay unambiguous
             s"""["${f.face}",${f.param},${f.recall},${f.msPerQuery}""" +
               (if (f.artifact.isEmpty && f.ref.isEmpty) "]"
                else s",${q(f.artifact)}" +
                  f.ref.map(r => s",${q(r.toJson)}]").getOrElse("]"))
           }.mkString(",")}]}"""))

  /** Read a snapshot's persisted calibration; None when never calibrated
    * OR when the sidecar is truncated/corrupt (writeCalibration is not
    * atomic — a half-written file must degrade to the exact-scan
    * fallback the absent-file path already models, never crash a
    * serving process). */
  def readCalibration(spark: SparkSession, path: String)
      : Option[WidthCalibration] = {
    // the READ is outside the catch: a transient store error must stay a
    // visible, retryable failure — only a PRESENT-but-unparseable sidecar
    // degrades to None (else a network blip silently downgrades a
    // calibrated serve to a corpus-wide exact scan)
    val json = readSmallFile(spark, s"$path/calibration.json")
    if (json == null) return None
    try {
      def num(k: String) =
        (s""""$k":\\s*(-?[0-9.Ee+-]+)""").r.findFirstMatchIn(json).get.group(1)
      // the regexes apply to the SLICED "curve" / "faces" array
      // substrings, never the whole document — a free-text artifact
      // containing a bracketed numeric pattern like [8,0.5] (a snapshot
      // path, a knob note) must not be mis-parsed as a curve point
      val curveJson = sliceBalanced(json, "curve", '[', ']').get
      val curve = """\[(\d+),([-0-9.Ee+]+)\]""".r.findAllMatchIn(curveJson)
        .map(m => (m.group(1).toInt, m.group(2).toDouble)).toSeq
      // the face table is optional (pre-face sidecars parse unchanged).
      // Trailing quoted elements are optional too: 4-element
      // (pre-artifact), 5-element (free-text artifact only), 6-element
      // (+ escaped structured-ref JSON) entries all parse
      val facesJson = sliceBalanced(json, "faces", '[', ']').getOrElse("")
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      val faces = ("""\["(\w+)",(\d+),([-0-9.Ee+]+),([-0-9.Ee+]+)""" +
          """(?:,"((?:[^"\\]|\\.)*)")?(?:,"((?:[^"\\]|\\.)*)")?\]""").r
        .findAllMatchIn(facesJson)
        .map(m => FacePoint(m.group(1), m.group(2).toInt,
          m.group(3).toDouble, m.group(4).toDouble,
          Option(m.group(5)).map(unesc).getOrElse(""),
          Option(m.group(6)).map(unesc).flatMap(FaceArtifact.fromJson))).toSeq
      Some(WidthCalibration(num("search_width").toInt,
        num("target_recall").toDouble, num("k").toInt,
        num("sample_recall").toDouble, curve, faces))
    } catch { case _: Exception => None }
  }

  /** Slice the balanced `open`…`close` value of `"key":` out of a JSON
    * document — string-aware (quotes and escapes inside the value never
    * confuse the depth count), so regex-based field extraction can run
    * on exactly the substring it targets. None when the key is absent
    * or the value is truncated. */
  private[graft] def sliceBalanced(json: String, key: String, open: Char,
      close: Char): Option[String] = {
    val at = json.indexOf(s""""$key":""")
    if (at < 0) return None
    val start = json.indexOf(open, at + key.length + 3)
    if (start < 0) return None
    var depth = 0; var i = start; var inStr = false; var escaped = false
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inStr = false
      } else if (c == '"') inStr = true
      else if (c == open) depth += 1
      else if (c == close) {
        depth -= 1
        if (depth == 0) return Some(json.substring(start, i + 1))
      }
      i += 1
    }
    None
  }

  /** Read a small file via the Hadoop FS; null when absent. */
  private[graft] def readSmallFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return null
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Identity partitioner over shard ids (keys are already 0..n-1):
    * partition index == shard id, which the driverless probe relies on.
    * Equality by partition count so `partitionBy` can skip redundant
    * shuffles on already-partitioned RDDs. */
  private[index] class ShardPartitioner(n: Int) extends org.apache.spark.Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case s: ShardPartitioner => s.numPartitions == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  /** The shard-assignment expression — single source of truth for build
    * AND append's affected-shard discovery (divergence would classify
    * touched shards as untouched and corrupt the merge). */
  private[index] def shardOf(id: org.apache.spark.sql.Column, numShards: Int) =
    pmod(id, lit(numShards)).cast("int")

  /** Shard-build pipeline shared by [[build]] and [[VectorIndex.append]]:
    * (id, embedding) rows → shard assignment (id % numShards) → one
    * partition-local graph build per shard → IndexRows. */
  private[index] def buildRows(
      df: DataFrame, params: IndexParams, numShards: Int): Dataset[IndexRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    buildPartitions(
      df
        .select(col("id").cast("long"), col("embedding"))
        .withColumn("sub_index_id", shardOf(col("id"), numShards))
        .repartition(numShards, col("sub_index_id"))
        .sortWithinPartitions(col("sub_index_id"), col("id"))
        .as[(Long, Array[Float], Int)],
      params)
  }

  /** Partition-local graph build over rows that are ALREADY grouped by
    * sub_index_id within each partition and id-sorted within each group —
    * the post-exchange half of [[buildRows]], also reachable without any
    * exchange from a shard-bucketed corpus table ([[buildFromBucketed]]).
    * A shard revisited after a different shard in the same partition means
    * the ordering contract is broken (two partial graphs would silently
    * share a shard id) — fail the task instead. */
  private[graft] def buildPartitions(
      ds: Dataset[(Long, Array[Float], Int)], params: IndexParams): Dataset[IndexRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val p = params
    ds
      .mapPartitions { it =>
        // consecutive rows share sub_index_id after the sort; build each
        // shard's graph in ascending-id insertion order. Dimension is fixed
        // at index creation (SURVEY §1.1) — enforce it on ingest.
        var dim = -1
        val checked = it.map { r =>
          if (dim == -1) dim = r._2.length
          else require(r._2.length == dim,
            s"embedding dimension mismatch at id=${r._1}: got ${r._2.length}, index dimension is $dim")
          r
        }
        val bit = checked.buffered
        val built = mutable.BitSet.empty
        new Iterator[IndexRow] {
          private var pending: Iterator[IndexRow] = Iterator.empty
          def hasNext: Boolean = pending.hasNext || bit.hasNext
          def next(): IndexRow = {
            if (!pending.hasNext) {
              val shardId = bit.head._3
              require(!built.contains(shardId),
                s"input rows not grouped by sub_index_id: shard $shardId reappeared " +
                  "after another shard (bucketed corpus unsorted or mis-bucketed?)")
              built += shardId
              val vecs = mutable.ArrayBuffer.empty[(Long, Array[Float])]
              var prevId = Long.MinValue
              while (bit.hasNext && bit.head._3 == shardId) {
                val r = bit.next()
                require(r._1 > prevId,
                  s"ids not ascending within shard $shardId: ${r._1} after $prevId " +
                    "(bucketed corpus unsorted, or duplicate ids?)")
                prevId = r._1
                vecs += ((r._1, r._2))
              }
              val g = new SubIndexGraph(p, vecs.length)
              vecs.foreach { case (id, v) => g.insert(id, v) }
              pending = dehydrate(shardId, g)
            }
            pending.next()
          }
        }
      }
  }

  /** Derive the SQ8 quantization range from the corpus itself: the global
    * element-wise min/max in ONE map-only aggregation (array_min/array_max
    * per row, then a scalar agg — no explode, no shuffle of vector data).
    * A hardcoded range silently saturates any corpus with a different
    * spread to bytes 0/255 and collapses quantized recall; min/max never
    * saturates. A constant corpus (hi == lo) widens the range by 0.5 each
    * way so the encode stays well-defined. */
  def calibrateQuantRange(df: DataFrame, embCol: String = "embedding"): (Float, Float) = {
    val r = df.agg(
      min(array_min(col(embCol))).as("lo"),
      max(array_max(col(embCol))).as("hi")).head
    require(!r.isNullAt(0) && !r.isNullAt(1),
      "cannot calibrate a quantization range from an empty corpus")
    val (lo, hi) = (r.getFloat(0), r.getFloat(1))
    if (hi > lo) (lo, hi) else (lo - 0.5f, hi + 0.5f)
  }

  /** Quantized bulk build with auto-calibrated range: one calibration pass
    * ([[calibrateQuantRange]]) fixes quantLo/quantHi from the data, then
    * the normal build runs with SQ8 storage. The calibrated range persists
    * through save/load via the params.json sidecar, so appends and loaded
    * probes quantize identically. */
  def buildAutoQuantized(
      df: DataFrame, params: IndexParams, numShards: Int): VectorIndex = {
    // calibrate over what the index will STORE: for a cosine index that
    // is the normalized vectors (range ⊆ [-1, 1], usually much tighter —
    // calibrating raw values would waste quantization resolution)
    val (lo, hi) = calibrateQuantRange(normalizeInput(df, params))
    build(df, params.copy(quantized = true, quantLo = lo, quantHi = hi), numShards)
  }

  /** Calibrate the MIPS norm bound M from the corpus itself: the max
    * corpus L2 norm in ONE map-only aggregation (per-row norm via a
    * higher-order `aggregate`, then a scalar max — no explode, no vector
    * shuffle), widened by a relative slack so float round-trips of the
    * extreme vector never trip the [[graft.functions.VectorFunctions
    * .mipsAugmentArray]] bound check. M parameterizes the
    * augmented-dimension transform x -> [x, sqrt(M² − |x|²)] that
    * expresses inner-product top-k through the Euclidean2 index
    * (Bachrach et al., RecSys'14). */
  def calibrateMipsNorm(df: DataFrame, embCol: String = "embedding",
      slack: Float = 1e-4f): Float = {
    val norm = sqrt(aggregate(col(embCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val r = df.agg(max(norm).as("m")).head
    require(!r.isNullAt(0), "cannot calibrate a MIPS norm bound from an empty corpus")
    val m = r.getDouble(0)
    require(m > 0.0, "cannot calibrate a MIPS norm bound from an all-zero corpus")
    (m * (1.0 + slack)).toFloat
  }

  /** Inner-product (MIPS) index build with auto-calibrated norm bound:
    * one calibration pass ([[calibrateMipsNorm]]) fixes mipsMaxNorm, then
    * the normal build runs with the augmented-dimension transform at the
    * API boundary. The bound persists through save/load via params.json,
    * so appends and loaded probes augment identically. Probe results rank
    * by DESCENDING inner product (augmented-L2² = M² + |q|² − 2⟨q,x⟩ is
    * monotone in −⟨q,x⟩ for a fixed query). */
  def buildMips(df: DataFrame, params: IndexParams, numShards: Int): VectorIndex = {
    val m = calibrateMipsNorm(df)
    build(df, params.copy(metric = graft.functions.DistanceMetric.Euclidean2,
      augmentForMips = true, mipsMaxNorm = m), numShards)
  }

  /** User-supplied vectors transformed iff the params ask for an
    * API-boundary transform (cosine normalization / MIPS augmentation) —
    * applied ONLY to fresh API input (build/buildTo/append/bucketed
    * corpus), never to internally recovered rows: re-applying a float
    * transform drifts its last bits, which would break the
    * append-rebuild == full-rebuild and save/load bit invariants. A
    * narrow typed map — adds no exchange anywhere. */
  private[index] def normalizeInput(df: DataFrame, params: IndexParams): DataFrame =
    if (!params.transformsInput) df
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val p = params
      df.select(col("id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, p.transformCorpusVector(v)) }
        .toDF("id", "embedding")
    }

  /** Bulk build (reference O1 insert loop, parallelized across shards).
    * Input df must have columns (id LONG, embedding ARRAY<FLOAT>). */
  def build(df: DataFrame, params: IndexParams, numShards: Int): VectorIndex = {
    val cached = buildRows(normalizeInput(df, params), params, numShards).cache()
    val meta = computeMeta(cached)
    new VectorIndex(params, numShards, cached, meta,
      java.util.UUID.randomUUID().toString)
  }

  /** Build STRAIGHT TO STORAGE: index rows stream from the build tasks
    * directly into compressed parquet — no cluster-wide cache, no
    * serialized eviction spill; exactly one on-disk copy. Returns the
    * LOADED index over that parquet (lazy cache, rehydrated per probe).
    *
    * This is the decade-scale disk mitigation measured in SCALE.md: at
    * 100M x 64d the MEMORY_AND_DISK cache spill of a cached build
    * (Kryo-serialized rows evicted wholesale) is several times the
    * compressed parquet footprint and can exhaust a single node's local
    * disk before the first probe runs. On a cluster the same call is
    * simply "build and publish the index snapshot" — the handle every
    * OTHER job probes. */
  def buildTo(df: DataFrame, params: IndexParams, numShards: Int,
      path: String): VectorIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    buildRows(normalizeInput(df, params), params, numShards)
      .write.mode("overwrite").parquet(s"$path/rows")
    val rowsDisk = spark.read.parquet(s"$path/rows").as[IndexRow]
    val meta = computeMeta(rowsDisk) // one (shard, layer, offset) scan of the parquet
    writeMetaAndParams(spark, path, meta, params, numShards,
      java.util.UUID.randomUUID().toString)
    // one knob for "too big for a second copy": when the probe layout
    // cache is off, the row Dataset cache (MEMORY_AND_DISK — another
    // full copy) must be off too, or the mitigation is undone
    load(spark, path, cache = !spark.conf
      .get("spark.graft.probeLayoutStorage", "MEMORY_ONLY")
      .equalsIgnoreCase("NONE"))
  }

  /** Shard-scoped append PUBLISHING a new snapshot — the incremental-
    * corpus face of [[buildTo]]: load `oldPath`, rebuild ONLY the shards
    * the new ids hash into (the [[VectorIndex.append]] semantics, so the
    * result is bit-identical to one full rebuild over the union), and
    * land the result at `newPath` while moving as few untouched bytes
    * as possible. Untouched work is skipped at two levels:
    *
    *  - COMPUTE: only affected shards re-insert (buildRows over the
    *    affected slice ∪ fresh); every other shard's graph is reused
    *    verbatim, meta included.
    *  - I/O: a kept rows file whose parquet footer shows no affected
    *    shard in any row group's [min, max] of `sub_index_id` (rows are
    *    shard-sorted within files, so the stats are tight) is HARDLINKED
    *    into the new snapshot — zero bytes moved; on a store without
    *    links (or cross-device) it falls back to a byte copy, which on
    *    object stores is the server-side-copy fast path. Only files
    *    that MIX affected and unaffected shards are read and rewritten
    *    filtered (with one-shard-per-file layouts from [[buildTo]],
    *    that is usually zero files).
    *
    * The old snapshot is left untouched (still servable — snapshots are
    * immutable generations; retire it when traffic drains). Returns the
    * loaded handle over `newPath`, same cache knob as [[buildTo]].
    *
    * Reference contract: the ref's `add` path (dehnsw.h:558-608) grows
    * one in-memory index; at 100 TB the index is a published artifact,
    * so "add" must mean "publish the next snapshot without rebuilding
    * or re-copying the untouched 99%". */
  def appendTo(spark: SparkSession, oldPath: String,
      newVectors: DataFrame, newPath: String): VectorIndex = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    requireDistinctPaths(hconf, oldPath, newPath, "appendTo")
    val old = load(spark, oldPath, cache = false)
    val params = old.params
    val numShards = old.numShards
    // shared discover/recover/validate half ([[appendPrep]]); the
    // existing-rows isin predicate is pushed to parquet, and the
    // shard-sorted layout makes the row-group stats prune the scan to
    // the affected files
    val (fresh, affectedSeq, rebuildInput) =
      old.appendPrep(newVectors, normalize = true, cacheInput = false)
    if (affectedSeq.isEmpty) {
      fresh.unpersist()
      throw new IllegalArgumentException("appendTo over an empty batch")
    }
    val affected = affectedSeq.toSet
    // 1) rebuilt shards stream straight to the new snapshot (no cache);
    // unpersist in finally — a failed write must not leak the cached
    // batch (appendPrep's leak-safe contract covers only validation)
    try {
      buildRows(rebuildInput, params, numShards)
        .write.mode("overwrite").parquet(s"$newPath/rows")
    } finally fresh.unpersist()
    // 2) rebuilt-shard meta from the (still rebuilt-only) new rows dir
    val rebuiltMeta = computeMeta(
      spark.read.parquet(s"$newPath/rows").as[IndexRow])
    // 3) kept files: hardlink clean ones, rewrite only mixed ones
    val conf = hconf
    val oldRows = new org.apache.hadoop.fs.Path(s"$oldPath/rows")
    val fs = oldRows.getFileSystem(conf)
    val dstFs = new org.apache.hadoop.fs.Path(s"$newPath/rows").getFileSystem(conf)
    val dataFiles = fs.listStatus(oldRows).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
    val mixed = scala.collection.mutable.ArrayBuffer.empty[String]
    dataFiles.foreach { p =>
      import scala.jdk.CollectionConverters._
      // footer-only read (KB-sized, per kept FILE): per-row-group
      // [min, max] of the shard column; None when stats are missing
      val ranges: Seq[Option[(Int, Int)]] =
        org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, p, org.apache.parquet.format.converter
            .ParquetMetadataConverter.NO_FILTER)
          .getBlocks.asScala.toSeq.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == "sub_index_id")
              .map(_.getStatistics)
              .filter(s => s != null && !s.isEmpty)
              .map(s => (s.genericGetMin.asInstanceOf[Number].intValue,
                s.genericGetMax.asInstanceOf[Number].intValue))
          }
      val touchesAffected = ranges.exists {
        case Some((lo, hi)) => affected.exists(s => lo <= s && s <= hi)
        case None => true // no stats: conservatively mixed
      }
      val onlyAffected = ranges.nonEmpty && ranges.forall {
        case Some((lo, hi)) => (lo to hi).forall(affected)
        case None => false
      }
      if (!touchesAffected) {
        // pure kept file: the shared hardlink-else-copy fast path
        linkOrCopyFile(fs, p, dstFs,
          new org.apache.hadoop.fs.Path(s"$newPath/rows/${p.getName}"), conf)
      } else if (!onlyAffected) mixed += p.toString
      // else: file holds only affected shards — superseded by the rebuild
    }
    if (mixed.nonEmpty)
      spark.read.parquet(mixed.toSeq: _*)
        .filter(!col("sub_index_id").isin(affectedSeq: _*))
        .write.mode("append").parquet(s"$newPath/rows")
    val meta2 = (old.meta.filterNot(m => affected(m.sub_index_id)) ++ rebuiltMeta)
      .sortBy(_.sub_index_id)
    writeMetaAndParams(spark, newPath, meta2, params, numShards,
      java.util.UUID.randomUUID().toString)
    load(spark, newPath, cache = !spark.conf
      .get("spark.graft.probeLayoutStorage", "MEMORY_ONLY")
      .equalsIgnoreCase("NONE"))
  }

  /** Meta + params sidecars next to an already-written `rows` parquet.
    * meta is numShards tiny records — one small file write through the
    * Hadoop FS API (works for hdfs://, s3a://, file:, ...), not a Spark
    * job. */
  private[index] def writeMetaAndParams(
      spark: SparkSession, path: String, meta: Array[ShardMeta],
      p: IndexParams, numShards: Int, indexId: String): Unit = {
    writeSmallFile(spark, s"$path/meta.json",
      meta.map(m => s"""{"sub_index_id":${m.sub_index_id},"n_vectors":${m.n_vectors},""" +
        s""""layer_count":${m.layer_count},"entry_offset":${m.entry_offset}}""")
        .mkString("", "\n", "\n"))
    // schedule as from:M:RM triples — build provenance AND an append
    // contract (append rebuilds shards with the same schedule)
    val sched = p.schedule
      .map(s => s"${s.fromCount}:${s.minimumConnect}:${s.relaxedMonotonicity}")
      .mkString(";")
    val json =
      s"""{"metric":"${p.metric.name}","minimumConnect":${p.minimumConnect},
         |"relaxedMonotonicity":${p.relaxedMonotonicity},"step":${p.step},
         |"subIndexBound":${p.subIndexBound},"numShards":$numShards,
         |"schedule":"$sched",
         |"quantized":${p.quantized},"quantLo":${p.quantLo},"quantHi":${p.quantHi},
         |"normalizeForCosine":${p.normalizeForCosine},
         |"augmentForMips":${p.augmentForMips},"mipsMaxNorm":${p.mipsMaxNorm},
         |"indexId":"$indexId"}""".stripMargin
    writeSmallFile(spark, s"$path/params.json", json)
  }

  /** Partition stub for [[ShardAlignedRDD]]: target index == shard id,
    * wrapping the parent (file-scan) partition that holds that shard. */
  private class ShardAlignedPartition(
      override val index: Int, val parent: org.apache.spark.Partition)
    extends org.apache.spark.Partition

  /** Narrow re-indexing of a one-file-per-shard scan so that partition
    * index == shard id — the property every probe consumer relies on
    * (TaskContext.getPartitionId as the shard, [[VectorIndex
    * .queryDistributed]]'s zipPartitions against [[ShardPartitioner]]-
    * partitioned queries). Purity is enforced per ROW (a mis-packed
    * file partition would otherwise hydrate a graph from another
    * shard's rows — silent corruption, so it is a hard error). */
  private class ShardAlignedRDD(
      parent: org.apache.spark.rdd.RDD[IndexRow], perm: Array[Int],
      numShards: Int)
    extends org.apache.spark.rdd.RDD[IndexRow](parent) {
    override val partitioner: Option[org.apache.spark.Partitioner] =
      Some(new ShardPartitioner(numShards))
    override protected def getPartitions: Array[org.apache.spark.Partition] =
      Array.tabulate[org.apache.spark.Partition](perm.length)(s =>
        new ShardAlignedPartition(s, firstParent[IndexRow].partitions(perm(s))))
    override def compute(split: org.apache.spark.Partition,
        ctx: org.apache.spark.TaskContext): Iterator[IndexRow] = {
      val p = split.asInstanceOf[ShardAlignedPartition]
      val shardId = p.index
      firstParent[IndexRow].iterator(p.parent, ctx).map { r =>
        require(r.sub_index_id == shardId,
          s"sharded layout violation: a row of shard ${r.sub_index_id} " +
            s"appeared in the partition serving shard $shardId — the " +
            "rows_sharded layout is corrupt; re-run relayoutSharded")
        r
      }
    }
    override protected def getPreferredLocations(
        split: org.apache.spark.Partition): Seq[String] =
      firstParent[IndexRow].preferredLocations(
        split.asInstanceOf[ShardAlignedPartition].parent)
  }

  /** Build the shard-aligned probe layout from a [[relayoutSharded]]
    * directory: one whole-file partition per shard (split/packing
    * disabled for exactly this scan), a 1-row-per-partition probe job
    * to learn which file holds which shard, then a narrow re-index so
    * partition i == shard i. None (with a log line) when the layout
    * does not hold one file per shard — callers fall back to the
    * legacy shuffle, never to a wrong layout. */
  /** Serializes [[alignedLayout]]'s session-conf window: the file-split
    * knobs are read through `sessionState.conf` (NOT the thread-local
    * `SQLConf.get`), so a thread-scoped overlay cannot reach the file
    * scan's partition planning — the set/restore must be session-global
    * and therefore LOCKED, or two indexes loading concurrently could
    * interleave restores and one would plan under default confs, fail
    * the one-file-per-partition check, and silently fall back to the
    * 51 GB load shuffle this layout exists to remove. An unrelated
    * query planned by ANOTHER thread during the (narrow, planning-only)
    * window can still see 16 GB file partitions — a perf hiccup, never
    * a correctness one: mis-packed aligned scans are detected (and fall
    * back) and per-row shard purity is hard-checked at compute. */
  private val alignedLayoutLock = new Object

  private[index] def alignedLayout(spark: SparkSession, dir: String,
      numShards: Int): Option[org.apache.spark.rdd.RDD[IndexRow]] = {
    import spark.implicits._
    // PLAN the scan under the conf window, holding the lock; the window
    // ends before any job runs — RDD.partitions memoizes, so the
    // planning result is fixed once forced
    val raw = alignedLayoutLock.synchronized {
      val conf = spark.conf
      val overrides = Seq(
        // openCost == maxPartitionBytes closes a file partition after
        // every file (no packing two shards into one partition); files
        // below the bound are never split (no shard torn across two)
        "spark.sql.files.maxPartitionBytes" -> (16L << 30).toString,
        "spark.sql.files.openCostInBytes" -> (16L << 30).toString)
      val prev = overrides.map { case (k, _) => k -> conf.getOption(k) }
      overrides.foreach { case (k, v) => conf.set(k, v) }
      try {
        // classic stream reads, NOT Hadoop vectored IO: each aligned task
        // drains its file over MINUTES (graph hydration interleaves with
        // the read), and the vectored path bounds every prefetched range
        // fetch at 300 s — 32 slow-draining consumers starve the shared
        // fetch pool and the whole probe dies on a read "timeout"
        // (measured at the 100M decade). Per-scan option, no global state.
        val r = spark.read
          .option("parquet.hadoop.vectored.io.enabled", "false")
          .parquet(dir)
          .select(col("sub_index_id").cast("int"), col("offset"),
            col("global_id"), col("layer"), col("embedding"), col("out"),
            col("edges"))
          .as[IndexRow].rdd
        r.partitions.length // force planning under the conf window
        r
      } finally prev.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
    val nParts = raw.partitions.length // memoized above
    val firstShard = raw.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) Iterator((i, it.next().sub_index_id))
      else Iterator.empty
    }.collect()
    if (nParts != numShards || firstShard.length != numShards ||
        firstShard.map(_._2).distinct.length != numShards) {
      Console.err.println(
        s"graft: sharded layout at $dir is not one-file-per-shard " +
        s"($nParts partitions, ${firstShard.length} non-empty, " +
        s"${firstShard.map(_._2).distinct.length} distinct shards for " +
        s"$numShards shards) — falling back to the shuffle layout")
      None
    } else {
      val perm = new Array[Int](numShards)
      firstShard.foreach { case (i, s) => perm(s) = i }
      Some(new ShardAlignedRDD(raw, perm, numShards))
    }
  }

  /** One-time MIGRATION of a snapshot to the dir-sharded probe layout:
    * writes `<path>/rows_sharded/sub_index_id=N/` with EXACTLY one file
    * per shard (a hash repartition on the shard id puts all of a
    * shard's rows in one task, so each directory receives one file),
    * then validates the one-file-per-shard invariant and per-shard row
    * counts against meta.json. The flat `rows/` stays untouched — it
    * remains the authoritative copy for [[appendTo]]'s footer-stat
    * file surgery; this layout exists so every SERVING process's
    * [[VectorIndex!.probeLayout]] is a narrow scan instead of a
    * shuffle that re-serializes the whole index (~2.5x the parquet
    * bytes — 51 GB for the 100M M=8 snapshot, paid per JVM).
    *
    * Run it once per published snapshot, anywhere: the one shuffle it
    * pays is the last one any consumer of this snapshot pays. */
  def relayoutSharded(spark: SparkSession, path: String): Unit = {
    val rows = spark.read.parquet(s"$path/rows")
    val paramsJson = readSmallFile(spark, s"$path/params.json")
    require(paramsJson != null, s"missing $path/params.json")
    val numShards = """"numShards":\s*(\d+)""".r.findFirstMatchIn(paramsJson)
      .get.group(1).toInt
    rows.repartition(numShards, col("sub_index_id"))
      .write.mode("overwrite").partitionBy("sub_index_id")
      .parquet(s"$path/rows_sharded")
    // validate before anyone serves from it: exactly one data file per
    // shard directory, one directory per shard
    val base = new org.apache.hadoop.fs.Path(s"$path/rows_sharded")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("sub_index_id="))
    val nonEmptyShards = spark.read.parquet(s"$path/rows").
      select(col("sub_index_id")).distinct().count()
    require(dirs.length.toLong == nonEmptyShards,
      s"relayoutSharded wrote ${dirs.length} shard dirs for " +
        s"$nonEmptyShards non-empty shards at $path")
    dirs.foreach { d =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(base, d))
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
      require(files.length == 1,
        s"relayoutSharded: $d holds ${files.length} files — the " +
          "one-file-per-shard invariant failed (concurrent writer?)")
    }
  }

  /** One-time write of a shard-bucketed corpus table: rows land in
    * `numShards` buckets keyed by `sub_index_id` (the same `id % numShards`
    * assignment [[build]] uses — [[shardOf]] is the single source of
    * truth), each bucket one file sorted by (sub_index_id, id). A build
    * from this table ([[buildFromBucketed]]) then needs NO Exchange and NO
    * Sort — at 100 TB this is the difference between re-shuffling the
    * whole corpus on every (re)build and a pure narrow scan. The
    * pre-write repartition matches the bucket hash, so each task emits
    * exactly one bucket file (no tasks x buckets small-file explosion). */
  def writeBucketedCorpus(df: DataFrame, table: String, numShards: Int): Unit = {
    df.select(col("id").cast("long"), col("embedding"))
      .withColumn("sub_index_id", shardOf(col("id"), numShards))
      .repartition(numShards, col("sub_index_id"))
      .write.mode("overwrite")
      .bucketBy(numShards, "sub_index_id").sortBy("sub_index_id", "id")
      .saveAsTable(table)
  }

  /** Bulk build from a [[writeBucketedCorpus]] table with ZERO Exchange and
    * ZERO Sort: the bucketed scan already delivers each shard's rows
    * co-located (one bucket file per bucket, never split) and
    * (sub_index_id, id)-sorted, so the plan is scan → mapPartitions.
    * Plan-guarded in PlanShapeSpec; the grouped/sorted input contract is
    * additionally enforced in-task ([[buildPartitions]]) and a shard split
    * across partitions is caught by the computeMeta offset invariant. */
  def buildFromBucketed(
      spark: SparkSession, table: String, params: IndexParams): VectorIndex = {
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = cat.bucketSpec.getOrElse(
      sys.error(s"$table is not bucketed — write it with writeBucketedCorpus"))
    require(spec.bucketColumnNames == Seq("sub_index_id") &&
      spec.sortColumnNames.take(2) == Seq("sub_index_id", "id"),
      s"$table bucket spec ${spec} does not match writeBucketedCorpus layout")
    val numShards = spec.numBuckets
    // DisableUnnecessaryBucketedScan would demote the scan to ordinary
    // file splits (nothing above a mapPartitions "needs" bucketing), and a
    // split bucket file puts half a shard in each of two partitions — the
    // conf must be off while THIS plan is forced (build() materializes the
    // rows inside this window via computeMeta's action).
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val cached = buildPartitions(
        {
          import spark.implicits._
          val src = spark.table(table)
            .select(col("id").cast("long"), col("embedding"),
              col("sub_index_id").cast("int"))
            .as[(Long, Array[Float], Int)]
          // bucketed corpora hold RAW vectors — the API-boundary
          // transform (cosine normalization / MIPS augmentation) happens
          // here (narrow map, keeps the no-Exchange/no-Sort plan)
          if (params.transformsInput) {
            val p = params
            src.map { case (id, v, s) => (id, p.transformCorpusVector(v), s) }
          } else src
        }, params).cache()
      val meta = computeMeta(cached)
      new VectorIndex(params, numShards, cached, meta,
        java.util.UUID.randomUUID().toString)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Load a saved index (reference O10).
    * @param cache cache the row Dataset (default). Pass `false` for a
    *               corpus-scale index probed a bounded number of times:
    *               Dataset.cache is MEMORY_AND_DISK, i.e. a second
    *               uncompressed copy of an index already materialized as
    *               compressed parquet — at 100M rows that copy alone
    *               exceeds a single node's local-disk pool (SCALE.md);
    *               pair with `spark.graft.probeLayoutStorage=NONE`. */
  def load(spark: SparkSession, path: String, cache: Boolean = true): VectorIndex = {
    import spark.implicits._
    val rows0 = spark.read.parquet(s"$path/rows").as[IndexRow]
    val rows = if (cache) rows0.cache() else rows0
    val metaText = readSmallFile(spark, s"$path/meta.json")
    val meta =
      if (metaText != null) {
        def field(line: String, key: String): Long =
          s""""$key":\\s*(-?\\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
        metaText.split("\n")
          .filter(_.trim.nonEmpty)
          .map(l => ShardMeta(field(l, "sub_index_id").toInt, field(l, "n_vectors"),
            field(l, "layer_count").toInt, field(l, "entry_offset").toInt))
          .sortBy(_.sub_index_id)
      } else {
        // older saves wrote meta as a Spark JSON directory
        spark.read.json(s"$path/meta")
          .select(col("sub_index_id").cast("int"), col("n_vectors").cast("long"),
            col("layer_count").cast("int"), col("entry_offset").cast("int"))
          .as[ShardMeta].collect().sortBy(_.sub_index_id)
      }
    val paramsJson = readSmallFile(spark, s"$path/params.json")
    require(paramsJson != null, s"missing $path/params.json")
    def extract(key: String): String =
      s""""$key":\\s*"?([^,"}]+)"?""".r.findFirstMatchIn(paramsJson).get.group(1)
    val metric = DistanceMetric.all.find(_.name == extract("metric")).get
    // optional (older saves lack the key; empty string = no schedule)
    val schedule = """"schedule":\s*"([^"]*)"""".r.findFirstMatchIn(paramsJson)
      .map(_.group(1)).getOrElse("")
      .split(";").toSeq.filter(_.nonEmpty)
      .map { t =>
        val Array(f, m, rm) = t.split(":")
        ParamStep(f.toInt, m.toInt, rm.toInt)
      }
    // optional (older saves lack the keys; default = float storage)
    def extractOpt(key: String): Option[String] =
      s""""$key":\\s*"?([^,"}]+)"?""".r.findFirstMatchIn(paramsJson).map(_.group(1))
    val params = IndexParams(metric, extract("minimumConnect").toInt,
      extract("relaxedMonotonicity").toInt, extract("step").toInt,
      extract("subIndexBound").toLong, schedule,
      quantized = extractOpt("quantized").exists(_.toBoolean),
      quantLo = extractOpt("quantLo").map(_.toFloat).getOrElse(-0.5f),
      quantHi = extractOpt("quantHi").map(_.toFloat).getOrElse(0.5f),
      normalizeForCosine = extractOpt("normalizeForCosine").exists(_.toBoolean),
      augmentForMips = extractOpt("augmentForMips").exists(_.toBoolean),
      mipsMaxNorm = extractOpt("mipsMaxNorm").map(_.toFloat).getOrElse(0f))
    // fresh cache identity per load: reusing the persisted id would let a
    // probe of the loaded index hit executor-cached graphs built from the
    // ORIGINAL in-memory index (same JVM), silently bypassing the loaded
    // rows — the save/load invariance gate must exercise the load path
    val idx = new VectorIndex(params, extract("numShards").toInt, rows, meta,
      extract("indexId") + "#load-" + java.util.UUID.randomUUID().toString)
    // a relayoutSharded snapshot probes through the narrow aligned scan
    // (probeLayout fast path) — detected here so the handle knows its
    // layout; absence or a malformed layout degrades to the shuffle
    val shardedDir = new org.apache.hadoop.fs.Path(s"$path/rows_sharded/_SUCCESS")
    if (shardedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(shardedDir))
      idx.shardedLayoutDir = Some(s"$path/rows_sharded")
    idx
  }

  private def computeMeta(rows: Dataset[IndexRow]): Array[ShardMeta] = {
    import rows.sparkSession.implicits._
    // entry = the unique vector whose layer == shard layer_count, recorded
    // at promotion time; layer_count = max layer (dehnsw.h:495-499).
    // Declarative aggregate (max layer, min offset among them via negated
    // tie-break) so only (shard, layer, offset) shuffle — groupByKey +
    // mapGroups would drag embeddings and adjacency through the exchange.
    rows.groupBy(col("sub_index_id"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("layer").as("l"), (-col("offset")).as("no"))).as("m"),
        max(col("offset")).as("mo"))
      .select(col("sub_index_id"), col("n"),
        col("m.l").as("lc"), (-col("m.no")).as("eo"), col("mo"))
      .as[(Int, Long, Int, Int, Int)].collect()
      .map { case (s, n, lc, eo, mo) =>
        // a shard built twice (split across partitions — e.g. a bucketed
        // corpus read through file splits) yields duplicate offsets, so
        // max(offset) falls short of n-1; a contiguous single build never
        // does (dehydrate emits offsets 0..count-1)
        require(mo == n - 1,
          s"shard $s has $n rows but max offset $mo — shard built in " +
            "multiple partitions (corpus mis-partitioned?)")
        ShardMeta(s, n, lc, eo)
      }
      .sortBy(_.sub_index_id)
  }

  private[index] def dehydrate(shardId: Int, g: SubIndexGraph): Iterator[IndexRow] =
    (0 until g.count).iterator.map { o =>
      IndexRow(
        shardId, o, g.globalIds(o), g.layerOf(o), g.vecAt(o),
        g.out(o).map(el => (0 until el.size).map(i => OutEdge(el.ds(i), el.ns(i))).toSeq).toSeq,
        // adjacency arrays use swap-removal, so normalize to nbr order for
        // a canonical (rebuild-stable) persisted form
        g.edges(o).map(al => (0 until al.size).map(i => EdgeRef(al.nbrs(i), al.rcs(i)))
          .sortBy(_.nbr).toSeq).toSeq)
    }

  private[index] def rehydrate(
      params: IndexParams, m: ShardMeta, shardRows: Seq[IndexRow]): SubIndexGraph =
    rehydrateStreaming(params, m, shardRows.length, shardRows.iterator)

  /** Single-pass rehydration from an iterator: each IndexRow is copied
    * into the graph's primitive structures and becomes garbage
    * immediately — per-task live memory is ONE graph plus one row,
    * instead of a fully-materialized buffer of object-heavy rows
    * alongside the graph. At 780k-row shards the buffered form costs
    * >1 GB per concurrent task; 32 concurrent probe tasks of buffered
    * rehydration OOM'd the 100M probe JVM (SCALE.md). Capacity comes
    * from the count, which the probe paths read from ShardMeta. */
  private[index] def rehydrateStreaming(
      params: IndexParams, m: ShardMeta, n: Int,
      shardRows: Iterator[IndexRow]): SubIndexGraph = {
    val g = new SubIndexGraph(params, n)
    g.count = n
    g.layerCount = m.layer_count
    g.entryOffset = m.entry_offset
    var seen = 0
    for (r <- shardRows) {
      seen += 1
      val o = r.offset
      g.globalIds(o) = r.global_id
      g.setVec(o, r.embedding)
      g.layerOf(o) = r.layer
      g.out(o) = mutable.ArrayBuffer.from(r.out.map { layer =>
        val el = new EdgeList(math.max(layer.size, 4))
        layer.foreach(e => el.insert(e.dist, e.nbr))
        el
      })
      g.edges(o) = mutable.ArrayBuffer.from(r.edges.map { layer =>
        val al = new AdjList(math.max(layer.size, 4))
        layer.foreach(e => al.add(e.nbr, e.rc))
        al
      })
    }
    require(seen == n,
      s"shard ${m.sub_index_id}: rehydrated $seen rows, meta says $n")
    g
  }
}

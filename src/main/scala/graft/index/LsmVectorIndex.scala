package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** LSM-style generational vector index — the scale-safe streaming-ingest
  * form of the shard contract (reference: source/dehnsw.h:601-609, where a
  * full shard opens a new one; generational shards are that contract's
  * natural streaming shape).
  *
  * [[VectorIndex.append]] rebuilds every shard a batch touches, so with
  * `id % numShards` assignment a high-frequency stream rebuilds EVERY
  * shard EVERY micro-batch — per-event cost grows with shard size, the one
  * probe path whose work was O(index), not O(batch). Here instead:
  *
  *  - '''ingest''' builds a small FRESH index (its own generation) from
  *    just the batch — work is O(batch) and the sealed base is untouched
  *    (object-identity guaranteed, spec-gated);
  *  - '''query''' probes the base and every generation and merges their
  *    per-index top-k with the same partial/final merge the multi-shard
  *    probe uses (top-k of a union == top-k of the per-member top-k
  *    union, so exact-mode results equal one flat index — oracle-gated);
  *  - '''compact''' folds all generations into the base via the
  *    deterministic shard-scoped append once their total size crosses
  *    `compactThreshold`, bounding the generation count a probe pays for.
  *    Exact-mode probes are invariant across compaction (append ==
  *    full rebuild; spec-gated).
  *
  * Id uniqueness within each ingested batch is validated eagerly (cheap,
  * O(batch)); cross-generation/base clashes would need an O(index) lookup
  * per batch — exactly the cost this structure avoids — so they are
  * validated at compaction time by append's disjointness check.
  *
  * Instances are immutable: ingest/compact return a new handle; superseded
  * generations (and compacted bases this class itself created) have their
  * caches dropped automatically. The caller-supplied base is never
  * unpersisted.
  */
final class LsmVectorIndex private (
    val base: VectorIndex,
    val generations: Vector[VectorIndex],
    val compactThreshold: Long,
    val genShardSize: Long,
    ownsBase: Boolean,
    // logically-deleted ids (LSM tombstones): probes pass a kernel-level
    // liveness filter (one broadcast sorted primitive array, binary
    // search per candidate pop — dead rows never enter any shard's
    // top-k, so results are the exact live top-k with no overfetch);
    // compaction physically removes them via the shard-scoped
    // VectorIndex.remove. Bounded by deleteThreshold auto-purge.
    val tombstones: Set[Long] = Set.empty,
    val deleteThreshold: Long = Long.MaxValue,
    // Shared across every handle descended from the same lineage: true
    // while a compactAsync fold is in flight. Ingest must not auto-run the
    // SYNCHRONOUS compact() then — it would unpersist the very snapshot
    // generations (and possibly the base) the background append is still
    // reading, and the eventual swap would fail its base-identity require.
    asyncPending: java.util.concurrent.atomic.AtomicBoolean =
      new java.util.concurrent.atomic.AtomicBoolean(false))
    extends Serializable with AnnProbe {

  override def probeId: String =
    (base +: generations).map(_.indexId).mkString("lsm:", "+", "") +
      // tombstones change probe RESULTS without changing any member, so
      // they must change the identity too (rewrite/catalog cache safety)
      (if (tombstones.isEmpty) ""
       // md5 of the sorted id list, not hashCode: probeId exists so
       // rewrite/catalog caches never serve results for the WRONG deleted
       // set, and a 32-bit hash of two same-size sets can collide
       else {
         val md = java.security.MessageDigest.getInstance("MD5")
         val bb = java.nio.ByteBuffer.allocate(8)
         tombstones.toSeq.sorted.foreach { id =>
           bb.clear(); bb.putLong(id); md.update(bb.array())
         }
         s":t${tombstones.size}:${md.digest().map("%02x".format(_)).mkString}"
       })
  override def probeMetric: graft.functions.DistanceMetric = base.params.metric
  override def probeNormalized: Boolean = base.params.transformsInput
  override def probeSemanticMetric: graft.functions.DistanceMetric =
    if (base.params.normalizeForCosine) graft.functions.DistanceMetric.Cosine
    else if (base.params.augmentForMips) graft.functions.DistanceMetric.InnerProduct
    else base.params.metric
  override def probeSession: org.apache.spark.sql.SparkSession = base.rows.sparkSession
  override def probeDescription: String =
    s"lsm base shards=${base.numShards} + ${generations.size} generations"

  /** Vectors living in fresh generations (not yet compacted). */
  val freshCount: Long = generations.map(_.meta.map(_.n_vectors).sum).sum

  /** Fold one micro-batch (columns: id LONG, embedding ARRAY<FLOAT>) into
    * a new generation; auto-compacts when the fresh total crosses the
    * threshold. O(batch) work — the base and prior generations are reused
    * as-is. */
  def ingest(batch: DataFrame): LsmVectorIndex = {
    val fresh = batch.select(col("id").cast("long"), col("embedding")).cache()
    val counts = fresh.agg(count(lit(1)), count_distinct(col("id"))).head
    val (n, nDistinct) = (counts.getLong(0), counts.getLong(1))
    if (n == 0) { fresh.unpersist(); return this }
    require(n == nDistinct,
      s"ingested ids must be unique within the batch (${n - nDistinct} clashes)")
    val genShards = math.max(1L, (n + genShardSize - 1) / genShardSize).toInt
    val gen = VectorIndex.build(fresh, base.params, genShards)
    fresh.unpersist() // gen rows were materialized by build's meta pass
    val next = new LsmVectorIndex(
      base, generations :+ gen, compactThreshold, genShardSize, ownsBase,
      tombstones, deleteThreshold, asyncPending)
    // Auto-compaction is suppressed while an async fold is outstanding —
    // the swap returned by compactAsync absorbs those generations instead.
    if (next.freshCount >= compactThreshold && !asyncPending.get()) next.compact()
    else next
  }

  /** Fold every generation into the base (one deterministic shard-scoped
    * append over their union). Exact-mode probe results are unchanged —
    * append equals a full rebuild, and the merged probe equals a flat
    * probe. Generations this index built are unpersisted; so is the base
    * when it came from a previous compaction. */
  def compact(): LsmVectorIndex = {
    require(!asyncPending.get(),
      "compact() while a compactAsync fold is outstanding would unpersist " +
        "the snapshot generations (and owned base) the background append is " +
        "reading — apply the returned swap instead, or let it fail first")
    if (generations.isEmpty && tombstones.isEmpty) return this
    val spark = base.rows.sparkSession
    import spark.implicits._
    // physical delete first: tombstoned base ids leave via the
    // shard-scoped remove; tombstoned FRESH ids simply don't ride the
    // append. After the fold no tombstone survives — probes stop paying
    // the liveness filter.
    val purgedBase =
      if (tombstones.isEmpty) base
      else base.remove(tombstones.toSeq.toDF("id"))
    val newBase =
      if (generations.isEmpty) { purgedBase.optimize(); purgedBase }
      else {
        val freshVecs = generations
          .map(_.rows.toDF().select(col("global_id").as("id"), col("embedding")))
          .reduce(_ union _)
          .filter(if (tombstones.isEmpty) lit(true)
                  else !col("id").isInCollection(tombstones))
        purgedBase.appendRecovered(freshVecs) // materializes before we unpersist
      }
    generations.foreach(_.unpersist())
    if (ownsBase) base.unpersist()
    if ((purgedBase ne base) && (newBase ne purgedBase)) purgedBase.unpersist()
    new LsmVectorIndex(newBase, Vector.empty, compactThreshold, genShardSize,
      ownsBase = true, Set.empty, deleteThreshold, asyncPending)
  }

  /** Logical DELETE (tombstoning) — the index-lifecycle face the
    * reference has no answer to: ids stop appearing in any probe result
    * immediately (exactness via the kernel liveness filter — see the
    * tombstone field note), and the NEXT compaction removes them
    * physically through [[VectorIndex.remove]]'s shard-scoped rebuild.
    * Deleting an id that was never inserted is a harmless no-op
    * (idempotent), so callers can replay delete feeds. Auto-purges
    * (compacts) when the tombstone set reaches `deleteThreshold` — the
    * knob that bounds the driver-side set and the filter broadcast. */
  def delete(ids: Iterable[Long]): LsmVectorIndex = {
    val ts = tombstones ++ ids
    if (ts.size == tombstones.size) return this
    require(ts.size <= (1 << 20),
      s"${ts.size} tombstones exceed the 2^20 liveness-filter bound " +
        "(driver set + ~8 MB broadcast sizing) — " +
        "compact() (or lower deleteThreshold) to purge physically")
    unpersistTombstoneBc() // this handle is superseded; free its copy
    val next = new LsmVectorIndex(base, generations, compactThreshold,
      genShardSize, ownsBase, ts, deleteThreshold, asyncPending)
    if (ts.size >= deleteThreshold && !asyncPending.get()) next.compact()
    else next
  }

  /** Begin folding the CURRENT generations into the base on another
    * thread (Spark runs concurrent jobs from separate driver threads), so
    * ingest keeps accepting batches while the fold runs — the
    * background-compaction shape a live stream needs (a synchronous
    * [[compact]] blocks the batch that crosses the threshold for the
    * whole append rebuild).
    *
    * Returns a future SWAP function: apply it to any LATER handle
    * descended from this one (same leading generations — validated by
    * identity) to obtain the compacted equivalent, whose generations are
    * exactly the ones ingested since this call. Exact-mode probes are
    * unaffected by WHEN the swap is applied (same vectors either way —
    * the [[compact]] invariance, spec-gated). The snapshot generations
    * and this base (when owned) are unpersisted as part of the swap.
    * Applying the swap to an INVALID handle abandons the fold: its
    * output is dropped, the pending flag clears, and compaction can
    * simply run again. Dropping the swap without ever applying it
    * leaves auto-compaction disabled for the lineage — always apply
    * (or let the future fail, which also clears the flag). */
  def compactAsync()(implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[LsmVectorIndex => LsmVectorIndex] = {
    val snapshot = generations
    if (snapshot.isEmpty) return scala.concurrent.Future.successful(identity)
    val freshVecs = snapshot
      .map(_.rows.toDF().select(col("global_id").as("id"), col("embedding")))
      .reduce(_ union _)
    val oldBase = base
    val owned = ownsBase
    val pending = asyncPending
    require(pending.compareAndSet(false, true),
      "a compactAsync fold is already outstanding on this lineage")
    scala.concurrent.Future {
      val newBase =
        try oldBase.appendRecovered(freshVecs) // materializes before any unpersist
        catch { case e: Throwable => pending.set(false); throw e }
      // 0 = fresh, 1 = applied, 2 = abandoned: a FIRST misapply abandons
      // the fold (drop its output, re-enable compaction) instead of
      // leaking asyncPending=true forever with auto-compaction silently
      // disabled; a misapply AFTER a successful apply must not touch
      // newBase — it is a live base by then. Both outcomes CLAIM the fold
      // by CAS from 0, so the validity checks and the state transition
      // are effectively one atomic step: a concurrent misapply that loses
      // the CAS race to a valid apply cannot unpersist the just-installed
      // base (or clear pending twice), and a valid apply that loses to a
      // misapply fails loudly instead of returning an index whose base
      // was unpersisted under it.
      val state = new java.util.concurrent.atomic.AtomicInteger(0)
      (later: LsmVectorIndex) => {
        require(state.get() != 2,
          "compaction swap was abandoned by an earlier misapply — compact again")
        try {
          require(later.base eq oldBase,
            "compaction swap applied to a handle with a different base " +
              "(compacted concurrently elsewhere?)")
          require(later.generations.length >= snapshot.length &&
            later.generations.take(snapshot.length).zip(snapshot).forall {
              case (a, b) => a eq b
            },
            "compaction swap applied to a handle that does not extend the snapshot")
        } catch {
          case e: Throwable =>
            if (state.compareAndSet(0, 2)) {
              newBase.unpersist()
              pending.set(false)
            }
            throw e
        }
        require(state.compareAndSet(0, 1),
          if (state.get() == 1) "compaction swap already applied"
          else "compaction swap was abandoned by a concurrent misapply — compact again")
        snapshot.foreach(_.unpersist())
        if (owned) oldBase.unpersist()
        pending.set(false)
        new LsmVectorIndex(newBase, later.generations.drop(snapshot.length),
          later.compactThreshold, later.genShardSize, ownsBase = true,
          later.tombstones, later.deleteThreshold, pending)
      }
    }
  }

  /** Batch kNN probe across base + generations — same contract and output
    * schema as [[VectorIndex.query]] (searchWidth 0 = exact). Queries are
    * routed once (collected once for the broadcast path, never collected
    * for the driverless path) and each member index contributes at most k
    * candidates per query to one final merge. */
  def query(queries: DataFrame, k: Int, searchWidth: Int,
      maxBatch: Int = 100000): DataFrame = {
    val members = (base +: generations).filter(_.meta.nonEmpty)
    val spark = base.rows.sparkSession
    import spark.implicits._
    if (members.isEmpty) {
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "distance")
    }
    if (members.size == 1 && tombstones.isEmpty)
      return members.head.query(queries, k, searchWidth, maxBatch)
    val qds = queries
      .select(col("query_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val probeCount = qds.select(col("query_id")).limit(maxBatch + 1).count()
    if (probeCount <= maxBatch)
      queryBatch(qds.collect().sortBy(_._1), k, searchWidth, maxBatch)
    else {
      // kernel-level liveness filter: dead ids never enter any shard's
      // top-k, so every member returns its exact live top-k directly —
      // no k+tombstones overfetch (whose candidate volume grows with
      // the tombstone count), no post-filter. ONE broadcast shared by
      // every member's probe.
      val live = liveFilter
      mergeMembers(members.map(_.queryDistributed(queries, k, searchWidth, live)), k)
    }
  }

  /** Probe with an already-materialized query batch (broadcast path) —
    * the [[AnnProbe]] face the SQL rewrite splices in.
    *
    * FUSED across members: the cached probe layouts of the base and every
    * generation are unioned (a narrow concatenation — no recompute, no
    * shuffle) and probed in ONE job; each task maps its union partition
    * back to (member, local shard) through the broadcast shard offsets.
    * One job chain + one merge instead of one per member — the per-probe
    * fixed cost no longer grows with the generation count. */
  def queryBatch(batch: Array[(Long, Array[Float])], k: Int, searchWidth: Int,
      maxBatch: Int = 100000): DataFrame = {
    val members = (base +: generations).filter(_.meta.nonEmpty)
    val spark = base.rows.sparkSession
    import spark.implicits._
    if (members.isEmpty) {
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "distance")
    }
    if (members.size == 1 && tombstones.isEmpty)
      return members.head.queryBatch(batch, k, searchWidth, maxBatch)
    if (batch.isEmpty) {
      return spark.emptyDataset[(Long, Int, Long, Double)]
        .toDF("query_id", "rank", "neighbor_id", "distance")
    }
    // the fused path broadcasts the raw chunk straight into
    // probePartition, bypassing VectorIndex.queryBatch's query transform —
    // apply it here (cosine normalization / MIPS zero-augmentation;
    // members all share base.params; the single-member shortcut above
    // delegates and must NOT be pre-transformed or the vector would be
    // transformed twice)
    val normBatch =
      if (base.params.transformsInput)
        batch.map { case (id, v) => (id, base.params.transformQueryVector(v)) }
      else batch
    // kernel-level liveness filter (see query()) — each shard returns
    // its exact live top-k, no tombstone overfetch
    val live = liveFilter
    // member m owns union partitions [offsets(m), offsets(m+1))
    val offsets = members.map(_.numShards).scanLeft(0)(_ + _).toArray
    val memberInfo = members.map(m =>
      (m.indexId, m.params, m.meta.map(x => x.sub_index_id -> x).toMap)).toArray
    val bcInfo = spark.sparkContext.broadcast((offsets, memberInfo))
    val union = members.map(_.probeLayout).reduce(_ union _)
    val candidateChunks = normBatch.grouped(math.max(maxBatch, 1)).map { chunk =>
      val bcQueries = spark.sparkContext.broadcast(chunk)
      val rdd = union.mapPartitions { rit =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val (offs, info) = bcInfo.value
        var m = 0
        while (m + 1 < offs.length && offs(m + 1) <= pid) m += 1
        val (iid, params, metaMap) = info(m)
        VectorIndex.probePartition(
          rit, iid, pid - offs(m), params, metaMap, bcQueries.value, k, searchWidth,
          live)
      }
      spark.createDataset(rdd).toDF("query_id", "distance", "neighbor_id")
    }.toSeq
    mergeMembers(candidateChunks, k)
  }

  override def probeBatch(
      batch: Array[(Long, Array[Float])], k: Int, searchWidth: Int): DataFrame =
    queryBatch(batch, k, searchWidth)

  /** The tombstone set as ONE broadcast sorted primitive array, created
    * lazily on first probe and shared by every subsequent query on this
    * handle — tombstones are immutable per instance ([[delete]] returns
    * a new handle), so a long-lived serving loop reuses the single
    * executor-resident copy instead of accumulating one broadcast per
    * queryBatch call. */
  @transient private var tombstoneBcRef
      : org.apache.spark.broadcast.Broadcast[Array[Long]] = null
  private def tombstoneBc
      : org.apache.spark.broadcast.Broadcast[Array[Long]] = synchronized {
    if (tombstoneBcRef == null) {
      val sorted = tombstones.toArray
      java.util.Arrays.sort(sorted)
      tombstoneBcRef = base.rows.sparkSession.sparkContext.broadcast(sorted)
    }
    tombstoneBcRef
  }

  /** Release this handle's executor-resident tombstone copies (no-op if
    * never probed). [[delete]] calls it on the superseded handle so a
    * long-lived delete-heavy loop holds ONE live broadcast, not one per
    * derived handle until driver GC. unpersist (not destroy): the old
    * handle stays probe-able — executors just refetch on next use. */
  private def unpersistTombstoneBc(): Unit = synchronized {
    if (tombstoneBcRef != null) tombstoneBcRef.unpersist(false)
  }

  /** Kernel liveness filter from the tombstone set: null (no filtering
    * overhead anywhere in the kernel loop) when nothing is deleted;
    * otherwise a primitive-sorted-array binary search behind the
    * per-handle [[tombstoneBc]] broadcast — O(log t) per candidate with
    * zero boxing, every probe task sharing the one executor-resident
    * copy instead of each closure dragging a Set[Long] through task
    * serialization. */
  private def liveFilter: Long => Boolean = {
    if (tombstones.isEmpty) return null
    val bc = tombstoneBc
    gid => java.util.Arrays.binarySearch(bc.value, gid) < 0
  }

  private def mergeMembers(perMember: Seq[DataFrame], k: Int): DataFrame = {
    // no tombstone post-filter here: both callers thread the kernel
    // liveness filter into every member probe, so no dead id can reach
    // the merge — an isInCollection belt would re-serialize the whole
    // tombstone set into every task's plan for zero filtering effect
    val union = perMember
      .map(_.select(col("query_id"), col("distance"), col("neighbor_id")))
      .reduce(_ union _)
    TopK.topKMerge(union, k)
  }

  /** Total vectors across base + generations. */
  def vectorCount: Long = base.meta.map(_.n_vectors).sum + freshCount

  /** Drop caches of every member this handle references. The base is only
    * dropped when this class created it (a compaction product). */
  def unpersist(): Unit = {
    generations.foreach(_.unpersist())
    if (ownsBase) base.unpersist()
  }

  /** Persist the whole generational state: base + each generation through
    * [[VectorIndex.save]] (parquet rows + sidecars) plus one manifest.
    * Loading restores an equivalent handle mid-stream — ingest, probe and
    * compaction pick up exactly where the saved state left off. */
  def save(path: String): Unit = {
    base.save(s"$path/base")
    generations.zipWithIndex.foreach { case (g, i) => g.save(s"$path/gen-$i") }
    VectorIndex.writeSmallFile(base.rows.sparkSession, s"$path/lsm.json",
      s"""{"generations":${generations.length},"compactThreshold":$compactThreshold,""" +
        s""""genShardSize":$genShardSize,"deleteThreshold":$deleteThreshold,""" +
        s""""tombstones":[${tombstones.toSeq.sorted.mkString(",")}]}""")
  }
}

object LsmVectorIndex {
  /** Wrap a sealed base index for generational ingest.
    *
    * @param compactThreshold fold generations into the base once their
    *                         total vector count reaches this
    * @param genShardSize     max vectors per generation shard (a
    *                         micro-batch usually fits one shard) */
  def apply(base: VectorIndex, compactThreshold: Long,
      genShardSize: Long = 65536L,
      deleteThreshold: Long = Long.MaxValue): LsmVectorIndex = {
    require(compactThreshold > 0, "compactThreshold must be positive")
    require(genShardSize > 0, "genShardSize must be positive")
    require(deleteThreshold > 0, "deleteThreshold must be positive")
    new LsmVectorIndex(base, Vector.empty, compactThreshold, genShardSize,
      ownsBase = false, Set.empty, deleteThreshold)
  }

  /** Restore a [[LsmVectorIndex.save]]d generational index. The loaded
    * handle owns its members (unpersist/compaction may drop their
    * caches). */
  def load(spark: SparkSession, path: String): LsmVectorIndex = {
    val manifest = VectorIndex.readSmallFile(spark, s"$path/lsm.json")
    require(manifest != null, s"missing $path/lsm.json")
    def field(key: String): Long =
      s""""$key":\\s*(-?\\d+)""".r.findFirstMatchIn(manifest).get.group(1).toLong
    val nGens = field("generations").toInt
    val base = VectorIndex.load(spark, s"$path/base")
    val gens = (0 until nGens).map(i => VectorIndex.load(spark, s"$path/gen-$i")).toVector
    // optional fields: absent in manifests written before delete support
    val ts = """"tombstones":\s*\[([^\]]*)\]""".r.findFirstMatchIn(manifest)
      .map(_.group(1).split(',').filter(_.trim.nonEmpty).map(_.trim.toLong).toSet)
      .getOrElse(Set.empty[Long])
    val delThresh = """"deleteThreshold":\s*(-?\d+)""".r.findFirstMatchIn(manifest)
      .map(_.group(1).toLong).getOrElse(Long.MaxValue)
    new LsmVectorIndex(base, gens, field("compactThreshold"),
      field("genShardSize"), ownsBase = true, ts, delThresh)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexParams, LsmVectorIndex, VectorIndex}

/** LSM generational index: O(batch) ingest (base untouched), probe
  * equality against a flat single-build index, invariance across batch
  * splits and compaction points, and auto-compaction at the threshold. */
class LsmIndexSpec extends AnyFunSuite with SparkSuite {

  private val params =
    IndexParams(minimumConnect = 8, relaxedMonotonicity = 32, step = 2)

  private def emb = Tables.embeddings(spark, sfDir)

  private def baseIdx = VectorIndex.build(
    emb.filter(col("vec_id") >= 10 && col("vec_id") < 300)
      .select(col("vec_id").as("id"), col("embedding")),
    params, numShards = 4)

  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def slice(from: Int, until: Int): DataFrame =
    emb.filter(col("vec_id") >= from && col("vec_id") < until)
      .select(col("vec_id").as("id"), col("embedding"))

  private def resultSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  /** Flat single-build ground truth over vec_id in [10, hi). */
  private def flatExact(hi: Int): Set[(Long, Int, Long)] = {
    val flat = VectorIndex.build(
      emb.filter(col("vec_id") >= 10 && col("vec_id") < hi)
        .select(col("vec_id").as("id"), col("embedding")),
      params, numShards = 4)
    resultSet(flat.query(queries, 10, searchWidth = 0))
  }

  test("ingest is O(batch): the sealed base object is reused untouched") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
    val lsm2 = lsm.ingest(slice(300, 350))
    val lsm3 = lsm2.ingest(slice(350, 400))
    assert(lsm2.base eq lsm.base, "first ingest must not touch the base")
    assert(lsm3.base eq lsm.base, "second ingest must not touch the base")
    assert(lsm3.generations.size == 2 && lsm3.freshCount == 100)
    assert(lsm3.vectorCount == 390)
  }

  test("exact probe over base + generations equals the flat single-build index") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350)).ingest(slice(350, 420))
    assert(resultSet(lsm.query(queries, 10, searchWidth = 0)) == flatExact(420))
  }

  test("exact probe is invariant to how the stream was batched") {
    val a = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 400))
    val b = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 320)).ingest(slice(320, 360)).ingest(slice(360, 400))
    assert(resultSet(a.query(queries, 10, searchWidth = 0)) ==
      resultSet(b.query(queries, 10, searchWidth = 0)))
  }

  test("compaction preserves exact probe results and resets generations") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 360)).ingest(slice(360, 410))
    val before = resultSet(lsm.query(queries, 10, searchWidth = 0))
    val compacted = lsm.compact()
    assert(compacted.generations.isEmpty && compacted.freshCount == 0)
    assert(compacted.vectorCount == lsm.vectorCount)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == before)
  }

  test("ingest auto-compacts once fresh vectors reach the threshold") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 80)
      .ingest(slice(300, 350)) // 50 fresh — below threshold
    assert(lsm.generations.size == 1)
    val lsm2 = lsm.ingest(slice(350, 400)) // 100 >= 80 — compacts
    assert(lsm2.generations.isEmpty && lsm2.freshCount == 0)
    assert(lsm2.vectorCount == 390)
    assert(resultSet(lsm2.query(queries, 10, searchWidth = 0)) == flatExact(400))
  }

  test("duplicate ids within a batch are rejected eagerly; clashes with the base at compaction") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
    val dup = slice(300, 310).union(slice(300, 305))
    val e1 = intercept[IllegalArgumentException](lsm.ingest(dup))
    assert(e1.getMessage.contains("unique within the batch"))
    // id 100 already lives in the base: caught by append's disjointness
    // check when the generation folds in
    val clash = lsm.ingest(
      emb.filter(col("vec_id") === 100 || col("vec_id") === 300)
        .select(col("vec_id").as("id"), col("embedding")))
    val e2 = intercept[IllegalArgumentException](clash.compact())
    assert(e2.getMessage.contains("disjoint"))
  }

  test("save/load round-trips the generational state and stays ingestable") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350)).ingest(slice(350, 400))
    val before = resultSet(lsm.query(queries, 10, searchWidth = 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_lsm_save_").toString
    lsm.save(dir)
    val loaded = LsmVectorIndex.load(spark, dir)
    assert(loaded.generations.size == 2 && loaded.freshCount == lsm.freshCount)
    assert(loaded.compactThreshold == lsm.compactThreshold)
    assert(resultSet(loaded.query(queries, 10, searchWidth = 0)) == before)
    // the loaded handle keeps working: further ingest + compaction
    val more = loaded.ingest(slice(400, 430)).compact()
    assert(more.generations.isEmpty)
    assert(resultSet(more.query(queries, 10, searchWidth = 0)) == flatExact(430))
  }

  test("LSM over an EMPTY base: ingest-only lifecycle works end to end") {
    val emptyBase = VectorIndex.build(
      emb.filter(col("vec_id") < 0).select(col("vec_id").as("id"), col("embedding")),
      params, numShards = 4)
    val lsm = LsmVectorIndex(emptyBase, compactThreshold = 1000000)
    assert(resultSet(lsm.query(queries, 10, searchWidth = 0)).isEmpty)
    val grown = lsm.ingest(slice(10, 200)).ingest(slice(200, 350))
    assert(resultSet(grown.query(queries, 10, searchWidth = 0)) == flatExact(350))
    val compacted = grown.compact()
    assert(compacted.generations.isEmpty)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == flatExact(350))
  }

  test("property: ANY random batching of the stream probes identically (exact mode)") {
    val rnd = new scala.util.Random(20260813)
    val expected = flatExact(460)
    for (_ <- 1 to 3) {
      // random cut points over [300, 460)
      val cuts = (Seq(300, 460) ++ Seq.fill(rnd.nextInt(4))(300 + rnd.nextInt(160)))
        .distinct.sorted
      val lsm = cuts.sliding(2).foldLeft(
        LsmVectorIndex(baseIdx, compactThreshold = 1000000)) {
        case (acc, Seq(a, b)) => acc.ingest(slice(a, b))
        case (acc, _) => acc
      }
      assert(resultSet(lsm.query(queries, 10, searchWidth = 0)) == expected,
        s"mismatch for cuts $cuts")
    }
  }

  test("background compaction: ingest continues while the fold runs; swap preserves probes") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val lsm0 = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350)).ingest(slice(350, 400))
    val pending = lsm0.compactAsync()
    // keep ingesting while the fold runs on its own thread
    val lsm1 = lsm0.ingest(slice(400, 430)).ingest(slice(430, 460))
    val swap = scala.concurrent.Await.result(
      pending, scala.concurrent.duration.Duration(180, "seconds"))
    val compacted = swap(lsm1)
    assert(compacted.generations.size == 2,
      "only the generations ingested after the call should remain fresh")
    assert(compacted.vectorCount == lsm1.vectorCount)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == flatExact(460))
    // misuse: a handle that is not a descendant of the snapshot fails loudly
    val other = LsmVectorIndex(baseIdx, 1000000).ingest(slice(300, 320))
    intercept[IllegalArgumentException](swap(other))
    // misuse: the fold is claimed by exactly one successful apply — a
    // second apply (even to a valid handle) fails instead of
    // double-unpersisting the snapshot, and the compacted index it
    // returned stays live
    val e2 = intercept[IllegalArgumentException](swap(lsm1))
    assert(e2.getMessage.contains("already applied"))
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == flatExact(460))
  }

  test("auto-compaction is suppressed while an async fold is outstanding") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val lsm0 = LsmVectorIndex(baseIdx, compactThreshold = 60)
      .ingest(slice(300, 350)) // 50 fresh — below threshold
    val pending = lsm0.compactAsync()
    // crossing the threshold mid-fold must NOT run the synchronous
    // compact (it would unpersist the snapshot the fold is reading and
    // break the swap); the swap absorbs the backlog instead
    val lsm1 = lsm0.ingest(slice(350, 420)).ingest(slice(420, 440))
    assert(lsm1.generations.size == 3 && (lsm1.base eq lsm0.base),
      "ingest must keep stacking generations while the fold is in flight")
    val swap = scala.concurrent.Await.result(
      pending, scala.concurrent.duration.Duration(180, "seconds"))
    val compacted = swap(lsm1)
    assert(compacted.generations.size == 2)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == flatExact(440))
    // flag cleared: the next threshold crossing auto-compacts again
    val resumed = compacted.ingest(slice(440, 460))
    assert(resumed.generations.isEmpty && resumed.freshCount == 0,
      "auto-compaction must resume once the async fold has been swapped in")
    assert(resultSet(resumed.query(queries, 10, searchWidth = 0)) == flatExact(460))
  }

  test("synchronous compact() refuses while an async fold is outstanding") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val lsm0 = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350))
    val pending = lsm0.compactAsync()
    val e = intercept[IllegalArgumentException](lsm0.compact())
    assert(e.getMessage.contains("outstanding"))
    val swap = scala.concurrent.Await.result(
      pending, scala.concurrent.duration.Duration(180, "seconds"))
    val compacted = swap(lsm0)
    compacted.compact() // flag cleared — synchronous compaction allowed again
  }

  test("a FIRST misapply abandons the fold and re-enables compaction") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val lsm0 = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350))
    val swap = scala.concurrent.Await.result(
      lsm0.compactAsync(), scala.concurrent.duration.Duration(180, "seconds"))
    val other = LsmVectorIndex(baseIdx, 1000000).ingest(slice(300, 320))
    intercept[IllegalArgumentException](swap(other)) // misapply -> abandoned
    // the pending flag must not leak true: compaction works again
    val recompacted = lsm0.compact()
    assert(recompacted.generations.isEmpty)
    assert(resultSet(recompacted.query(queries, 10, searchWidth = 0)) == flatExact(350))
    // an abandoned swap can never be applied, even to the right handle
    val e = intercept[IllegalArgumentException](swap(lsm0))
    assert(e.getMessage.contains("abandoned"))
  }

  test("quantized base: generations inherit SQ8 storage and probe == quantized flat build") {
    val qParams = params.copy(quantized = true)
    val qBase = VectorIndex.build(
      emb.filter(col("vec_id") >= 10 && col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding")),
      qParams, numShards = 4)
    val lsm = LsmVectorIndex(qBase, compactThreshold = 1000000)
      .ingest(slice(300, 360)).ingest(slice(360, 420))
    assert(lsm.generations.forall(_.params.quantized),
      "generations must inherit the base's quantized storage")
    val flat = VectorIndex.build(
      emb.filter(col("vec_id") >= 10 && col("vec_id") < 420)
        .select(col("vec_id").as("id"), col("embedding")),
      qParams, numShards = 4)
    val viaLsm = resultSet(lsm.query(queries, 10, searchWidth = 0))
    assert(viaLsm == resultSet(flat.query(queries, 10, searchWidth = 0)))
    // and across compaction (append re-quantizes identically)
    assert(resultSet(lsm.compact().query(queries, 10, searchWidth = 0)) == viaLsm)
  }

  test("driverless routing (batch over maxBatch) equals the broadcast probe") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350)).ingest(slice(350, 400))
    val viaBroadcast = resultSet(lsm.query(queries, 10, searchWidth = 0))
    // maxBatch=2 forces the per-member queryDistributed path + merge
    val viaShuffle = resultSet(lsm.query(queries, 10, searchWidth = 0, maxBatch = 2))
    assert(viaShuffle == viaBroadcast)
  }

  test("beam probe across generations reaches exact recall at full width") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 400))
    val exact = resultSet(lsm.query(queries, 10, searchWidth = 0))
      .map(t => (t._1, t._3))
    val beam = resultSet(lsm.query(queries, 10, searchWidth = 64))
      .map(t => (t._1, t._3))
    val recall = (exact intersect beam).size.toDouble / exact.size
    assert(recall >= 0.9, s"beam recall across generations = $recall")
  }

  /** Ground truth over [10, hi) minus a deleted id set. */
  private def flatExactMinus(hi: Int, deleted: Set[Long]): Set[(Long, Int, Long)] = {
    val flat = VectorIndex.build(
      emb.filter(col("vec_id") >= 10 && col("vec_id") < hi &&
          !col("vec_id").isInCollection(deleted))
        .select(col("vec_id").as("id"), col("embedding")),
      params, numShards = 4)
    resultSet(flat.query(queries, 10, searchWidth = 0))
  }

  test("delete: tombstoned ids vanish from probes immediately and exactly") {
    val deleted = ((20L to 29L) ++ (310L to 314L)).toSet
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 400))
      .delete(deleted)
    val got = resultSet(lsm.query(queries, 10, searchWidth = 0))
    assert(got == flatExactMinus(400, deleted))
    assert(!got.exists(t => deleted(t._3)), "a deleted id surfaced in a probe")
  }

  test("delete: compaction purges physically and preserves probe results") {
    val deleted = ((20L to 29L) ++ (310L to 314L)).toSet
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 400))
      .delete(deleted)
    val before = resultSet(lsm.query(queries, 10, searchWidth = 0))
    val compacted = lsm.compact()
    assert(compacted.tombstones.isEmpty, "compaction must clear tombstones")
    assert(compacted.generations.isEmpty)
    // physically gone: the folded base holds exactly the live vectors
    assert(compacted.vectorCount == 390 - deleted.size)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == before)
  }

  test("delete: idempotent, unknown ids are no-ops, auto-purge at threshold") {
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000,
      deleteThreshold = 8)
    val l2 = lsm.delete(Seq(20L, 21L)).delete(Seq(20L, 21L)) // re-delete: no-op
    assert(l2.tombstones == Set(20L, 21L))
    val l3 = l2.delete(Seq(999999L)) // never inserted: harmless
    val probe = resultSet(l3.query(queries, 10, searchWidth = 0))
    assert(probe == flatExactMinus(300, Set(20L, 21L)))
    // crossing deleteThreshold auto-compacts: tombstones purge physically
    val l4 = l3.delete(30L to 36L)
    assert(l4.tombstones.isEmpty, "auto-purge must fire at deleteThreshold")
    assert(l4.vectorCount == 290 - 9) // 999999 was never there
  }

  test("interleaved ingest+delete across micro-batches probes like brute force over the live corpus") {
    import spark.implicits._
    // a CDC-shaped feed: appends and deletes interleave, auto-compaction
    // fires mid-stream (threshold 120 crossed by the second append, so
    // the outstanding tombstones purge physically there), and more
    // deletes land AFTER the fold. The invariance a real feed needs:
    // the final probe equals brute force over the live corpus no matter
    // where the compaction boundary fell.
    val deleted = ((20L to 24L) ++ Seq(310L, 311L, 355L, 30L)).toSet
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 120)
      .ingest(slice(300, 350))      // gen1: 50 fresh
      .delete(20L to 24L)           // base ids
      .delete(Seq(310L, 311L))      // fresh-generation ids
      .ingest(slice(350, 420))      // freshCount 120 -> auto-compacts, purges
      .delete(Seq(355L, 30L))       // post-compaction deletes (one ex-fresh, one base)
      .ingest(slice(420, 440))      // gen after the fold
    assert(lsm.tombstones == Set(355L, 30L),
      "pre-compaction tombstones must have purged in the auto-fold")
    val got = resultSet(lsm.query(queries, 10, searchWidth = 0))
    assert(got == flatExactMinus(440, deleted))
    // a final compact preserves the probe and goes fully physical
    val compacted = lsm.compact()
    assert(compacted.tombstones.isEmpty && compacted.generations.isEmpty)
    assert(resultSet(compacted.query(queries, 10, searchWidth = 0)) == got)
    assert(compacted.vectorCount == 430 - deleted.size)
  }

  test("remove: ids absent from the index rebuild NOTHING (shard-scope economics)") {
    import spark.implicits._
    val idx = baseIdx
    // every requested id is absent -> the index is returned untouched,
    // not a rebuilt copy (before round 13, absent ids still forced full
    // graph rebuilds of the shards their HASHES landed on)
    assert(idx.remove(Seq(999999L, 123456L).toDF("id")) eq idx,
      "removing only absent ids must be the identity")
    // mixed present+absent: result equals removing just the present ones
    val a = resultSet(idx.remove(Seq(20L, 999999L).toDF("id"))
      .query(queries, 10, searchWidth = 0))
    assert(a == flatExactMinus(300, Set(20L)))
  }

  test("delete: save/load round-trips tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("lsm_del_save_").toString
    val deleted = (20L to 24L).toSet
    val lsm = LsmVectorIndex(baseIdx, compactThreshold = 1000000)
      .ingest(slice(300, 350)).delete(deleted)
    lsm.save(dir)
    val back = LsmVectorIndex.load(spark, dir)
    assert(back.tombstones == deleted)
    assert(resultSet(back.query(queries, 10, searchWidth = 0)) ==
      resultSet(lsm.query(queries, 10, searchWidth = 0)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("compaction of a normalizeForCosine base preserves probes bit-for-bit") {
    // regression: compact() folds RECOVERED generation rows back through
    // append — re-normalizing them (already unit-norm; quantized:
    // dequantized midpoints) would drift bits and change exact probes.
    // appendRecovered must keep compaction probe-invariant for both the
    // float and the SQ8 cosine index.
    for (quant <- Seq(false, true)) {
      val corpus = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("id"), col("embedding"))
      val base = corpus.filter(col("id") % 3 =!= 0)
      val fresh = corpus.filter(col("id") % 3 === 0)
      val params0 = IndexParams(minimumConnect = 8, relaxedMonotonicity = 32,
        step = 2, normalizeForCosine = true)
      val baseIdx =
        if (quant) VectorIndex.buildAutoQuantized(base, params0, numShards = 2)
        else VectorIndex.build(base, params0, numShards = 2)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val lsm = LsmVectorIndex(baseIdx, compactThreshold = Long.MaxValue)
        .ingest(fresh)
      def snap(df: DataFrame) = df
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val before = snap(lsm.query(queries, 10, searchWidth = 0))
      val after = snap(lsm.compact().query(queries, 10, searchWidth = 0))
      assert(before === after, s"compaction changed probes (quant=$quant)")
    }
  }

  test("streaming kNN-graph maintenance is invariant to batching (s22)") {
    // exact-by-induction edge state: 1-slice (one big batch) and 4-slice
    // (incremental) streams must land on the identical reciprocal-pair
    // set — the invariance that lets v48's batch oracle gate s22
    def run(slices: Int) = graft.streaming.StreamingOps.streamKnnGraph(
      spark, s"$sfDir/embeddings.parquet",
      baseCorpusPred = col("vec_id") >= 10 && col("vec_id") < 200,
      newVectorsPred = col("vec_id") >= 200,
      kEdges = 3, sourceSlices = slices, statePartitions = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = run(1)
    val four = run(4)
    assert(one === four, s"1-slice ${one.size} pairs != 4-slice ${four.size}")
    assert(one.nonEmpty)
  }

  test("generational beam state is invariant to the compaction schedule") {
    // the LSM generation discipline over the edge list: per-batch writes
    // are delta frames, latest frame per src wins, frames fold back into
    // one when their count crosses the stateFrames bound. The sweep runs
    // 16 micro-batches at three bounds so every fold path is EXERCISED,
    // not just designed: frames=1 folds every batch (the monolithic
    // shape), frames=3 triggers the mid-stream generational fold ~5
    // times, frames=16 never folds (pure frame accumulation). All three
    // must land on the bit-identical final edge set.
    def run(framesBound: Int) = graft.streaming.StreamingOps.streamKnnGraph(
      spark, s"$sfDir/embeddings.parquet",
      baseCorpusPred = col("vec_id") >= 10 && col("vec_id") < 200,
      newVectorsPred = col("vec_id") >= 200,
      kEdges = 3, sourceSlices = 16, statePartitions = 4, searchWidth = 8,
      stateFrames = framesBound)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val eager = run(1)
    val mid = run(3)
    val lazily = run(16)
    assert(eager === mid,
      s"frames=1 gave ${eager.size} pairs, frames=3 gave ${mid.size}")
    assert(eager === lazily,
      s"frames=1 gave ${eager.size} pairs, frames=16 gave ${lazily.size}")
    assert(eager.nonEmpty)
  }

  test("beam-face streaming kNN-graph maintenance tracks the exact face (s24)") {
    // production face: per-batch cost is one beam probe (no corpus-so-far
    // scan); its final reciprocal-pair set must stay close to the exact
    // face's, and every distance it reports must be a TRUE squared-L2
    // (the beam may miss pairs but can never invent or misprice one)
    def run(sw: Int) = graft.streaming.StreamingOps.streamKnnGraph(
      spark, s"$sfDir/embeddings.parquet",
      baseCorpusPred = col("vec_id") >= 10 && col("vec_id") < 200,
      newVectorsPred = col("vec_id") >= 200,
      kEdges = 3, sourceSlices = 4, statePartitions = 4, searchWidth = sw)
    val exact = run(0).select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beamRows = run(8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val beam = beamRows.map(t => (t._1, t._2)).toSet
    val recall = (exact intersect beam).size.toDouble / exact.size
    assert(recall >= 0.85, s"beam-face edge recall $recall < 0.85 (exact=${exact.size})")
    // distances are genuine: re-derive each reported pair's squared L2
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") >= 10)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    beamRows.foreach { case (a, b, d) =>
      val (va, vb) = (emb(a), emb(b))
      var acc = 0.0
      var i = 0
      while (i < va.length) {
        val diff = va(i).toDouble - vb(i).toDouble; acc += diff * diff; i += 1
      }
      assert(math.abs(d - (math.rint(acc * 1e6) / 1e6)) < 1e-6,
        s"pair ($a,$b) distance $d != true $acc")
    }
  }
}

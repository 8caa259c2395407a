package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexParams, VectorIndex}

/** Gates for [[VectorIndex.appendTo]] — the snapshot-to-snapshot
  * shard-scoped append:
  *  - result == one full rebuild over the union (the append==rebuild
  *    bit invariant, probed);
  *  - untouched shard files are HARDLINKED into the new snapshot (same
  *    inode), never re-read or re-written;
  *  - only the affected shards' meta changes.
  */
class AppendToSpec extends AnyFunSuite with SparkSuite {

  private def corpus(n: Int, dim: Int, idOf: Int => Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val id = idOf(i)
      val r = new scala.util.Random(id * 2654435761L + 13)
      (id, Array.fill(dim)(r.nextFloat()))
    }.toDF("id", "embedding")
  }

  private def inode(p: java.nio.file.Path): Any =
    java.nio.file.Files.getAttribute(p, "unix:ino")

  private def checkAppendTo(params: IndexParams): Unit = {
    val dim = 8
    val numShards = 16
    val base = corpus(2000, dim, _.toLong)
    // new ids >= 2000, clustered on residues {0, 1}: exactly 2 of 16
    // shards are affected
    val batch = corpus(200, dim,
      i => 2000L + 16L * (i / 2) + (i % 2))
    val oldDir = java.nio.file.Files.createTempDirectory("graft_appendto_old_").toString
    val newDir = java.nio.file.Files.createTempDirectory("graft_appendto_new_").toString + "/snap"
    try {
      VectorIndex.buildTo(base, params, numShards, oldDir)
      val appended = VectorIndex.appendTo(spark, oldDir, batch, newDir)

      // append == rebuild-over-union, probed (same schedule by contract)
      val full = VectorIndex.build(base.union(batch), params, numShards)
      val qdf = corpus(20, dim, i => 900000L + i)
        .select(col("id").as("query_id"), col("embedding"))
      def key(idx: VectorIndex) = idx.query(qdf, 10, searchWidth = 16)
        .select("query_id", "neighbor_id", "distance")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(key(appended) === key(full))

      // appended ids are servable: probing AT a new vector finds it
      val probeNew = batch.limit(4)
        .select(col("id").as("query_id"), col("embedding"))
      val hits = appended.query(probeNew, 1, searchWidth = 16)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.forall { case (q, n) => q == n }, hits.mkString(","))

      // meta: only shards 0 and 1 changed
      val oldMeta = VectorIndex.load(spark, oldDir, cache = false).meta
        .map(m => m.sub_index_id -> m).toMap
      appended.meta.foreach { m =>
        if (m.sub_index_id > 1) assert(m == oldMeta(m.sub_index_id))
        else assert(m.n_vectors == oldMeta(m.sub_index_id).n_vectors + 100)
      }

      // I/O: every untouched shard file is the SAME inode (hardlink)
      val oldFiles = new java.io.File(s"$oldDir/rows").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(f => f.getName -> f).toMap
      val newFiles = new java.io.File(s"$newDir/rows").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      val sharedNames = newFiles.filter(f => oldFiles.contains(f.getName))
      assert(sharedNames.nonEmpty, "no kept files were carried over by link")
      sharedNames.foreach { f =>
        assert(inode(f.toPath) === inode(oldFiles(f.getName).toPath),
          s"${f.getName} was copied, not hardlinked")
      }
      // and links dominate: of the ~10 non-empty part files (16 shards
      // hash into 16 partitions with collisions), only the <=2 holding
      // the affected residues may be rewritten
      assert(sharedNames.length >= 6, s"only ${sharedNames.length} files linked")
    } finally {
      graft.streaming.StreamingOps.deleteRecursively(oldDir)
      graft.streaming.StreamingOps.deleteRecursively(
        new java.io.File(newDir).getParent)
    }
  }

  test("appendTo == full rebuild; untouched shard files hardlink (float)") {
    checkAppendTo(IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4))
  }

  test("appendTo == full rebuild; untouched shard files hardlink (SQ8)") {
    checkAppendTo(IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
      quantized = true, quantLo = 0f, quantHi = 1f))
  }

  test("retiring the old generation: delete is safe, freed vs shared bytes enumerated") {
    import org.apache.spark.sql.functions.col
    val params = IndexParams(minimumConnect = 4, relaxedMonotonicity = 16,
      step = 4, quantized = true, quantLo = 0f, quantHi = 1f)
    val dim = 8
    val base = corpus(2000, dim, _.toLong)
    val batch = corpus(200, dim, i => 2000L + 16L * (i / 2) + (i % 2))
    val oldDir = java.nio.file.Files.createTempDirectory("graft_retire_old_").toString
    val newRoot = java.nio.file.Files.createTempDirectory("graft_retire_new_").toString
    val newDir = s"$newRoot/snap"
    try {
      VectorIndex.buildTo(base, params, 16, oldDir)
      val appended = VectorIndex.appendTo(spark, oldDir, batch, newDir)
      val qdf = corpus(20, dim, i => 900000L + i)
        .select(col("id").as("query_id"), col("embedding"))
      def probe(idx: VectorIndex) = idx.query(qdf, 10, searchWidth = 16)
        .select("query_id", "neighbor_id", "distance")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val before = probe(appended)

      // retirement accounting BEFORE the delete: bytes the delete FREES
      // (old-exclusive files, nlink == 1) vs bytes merely UNSHARED
      // (hardlinked into the new generation, nlink > 1 — the inode
      // survives the delete)
      import scala.jdk.CollectionConverters._
      def files(d: String) = java.nio.file.Files
        .walk(java.nio.file.Paths.get(d)).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet")).toSeq
      val (shared, freed) = files(oldDir).partition(p =>
        java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] > 1)
      assert(shared.nonEmpty, "premise: some files must be shared via hardlink")
      assert(freed.nonEmpty,
        "premise: the rebuilt shards' old files must be old-exclusive")
      val sharedBytes = shared.map(java.nio.file.Files.size).sum
      val freedBytes = freed.map(java.nio.file.Files.size).sum
      assert(sharedBytes > 0 && freedBytes > 0)

      // DELETE the old generation wholesale, evict every resident graph
      // of the new handle (so nothing is served from memory), and
      // re-probe through a FRESH load — every byte must come off the new
      // snapshot's surviving files, bit-identically
      graft.streaming.StreamingOps.deleteRecursively(oldDir)
      assert(graft.index.ShardGraphCache.evict(appended.probeId) > 0,
        "premise: the probe above must have left resident graphs to evict")
      val fresh = VectorIndex.load(spark, newDir, cache = false)
      assert(probe(fresh) === before,
        "retiring the old snapshot corrupted the appended one")
      // the shared inodes are still alive through the new snapshot's links
      assert(files(newDir).nonEmpty)
    } finally {
      graft.streaming.StreamingOps.deleteRecursively(oldDir)
      graft.streaming.StreamingOps.deleteRecursively(newRoot)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.index.{IndexParams, VectorIndex}

/** Gates for the dir-sharded snapshot probe layout
  * ([[VectorIndex.relayoutSharded]] + the probeLayout fast path): the
  * legacy load shuffles the ENTIRE index row-wise onto shard-aligned
  * partitions before the first probe (~2.5x the snapshot's parquet
  * bytes — 51 GB at the 100M decade, paid by every serving JVM); the
  * sharded layout replaces that with a narrow one-file-per-shard scan.
  *  - probe equivalence: every probe face (exact, beam, multi-width,
  *    driverless distributed) over the sharded load is bit-identical
  *    to the legacy load;
  *  - plan property: the aligned probe layout has NO shuffle dependency
  *    and carries the ShardPartitioner (queryDistributed's zip relies
  *    on partition index == shard id);
  *  - safety: a corrupted layout (a shard dir deleted) falls back to
  *    the legacy shuffle with identical results, never a wrong probe. */
class ShardedLayoutSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dim = 8
  private def corpus(n: Int) = (0L until n.toLong).map { id =>
    val r = new scala.util.Random(id * 2654435761L + 99)
    (id, Array.fill(dim)(r.nextFloat()))
  }

  test("sharded layout: shuffle-free aligned probe == legacy probe on every face") {
    val corpusDf = corpus(900).toDF("id", "embedding")
    val params = IndexParams(minimumConnect = 4, relaxedMonotonicity = 16,
      step = 4, quantized = true, quantLo = 0f, quantHi = 1f)
    val qdf = (0L until 6L).map { qid =>
      val r = new scala.util.Random(qid * 104729 + 31)
      (qid, Array.fill(dim)(r.nextFloat()))
    }.toDF("query_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_sharded_").toString
    try {
      VectorIndex.buildTo(corpusDf, params, numShards = 4, s"$dir/snap")
      VectorIndex.relayoutSharded(spark, s"$dir/snap")
      val legacy = VectorIndex.load(spark, s"$dir/snap", cache = false)
      legacy.shardedLayoutDir = None // force the shuffle path
      val sharded = VectorIndex.load(spark, s"$dir/snap", cache = false)
      assert(sharded.shardedLayoutDir.nonEmpty, "load must detect the layout")

      // plan property: narrow, aligned, shard-partitioned
      val layout = sharded.probeLayout
      assert(layout.partitions.length === 4)
      assert(layout.partitioner.nonEmpty, "aligned layout must carry the partitioner")
      def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
        rdd.dependencies.exists {
          case _: org.apache.spark.ShuffleDependency[_, _, _] => true
          case d => hasShuffle(d.rdd)
        }
      assert(!hasShuffle(layout), "aligned probe layout must not shuffle")
      assert(hasShuffle(legacy.probeLayout), "premise: legacy layout shuffles")

      def probes(idx: VectorIndex): Seq[Set[(Long, Int, Long)]] = Seq(
        idx.query(qdf, 10, 0), // exact scan
        idx.query(qdf, 10, 8), // beam
        idx.queryDistributed(qdf, 10, 4), // driverless zip against layout
        idx.queryBatchMultiWidth(
            qdf.as[(Long, Array[Float])].collect().sortBy(_._1), 10, Seq(2, 8))
          .select(col("query_id") * 100 + col("search_width"),
            col("rank"), col("neighbor_id"))
      ).map(_.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
      val (lp, sp) = (probes(legacy), probes(sharded))
      lp.zip(sp).zipWithIndex.foreach { case ((l, s), i) =>
        assert(s === l, s"probe face $i differs between layouts")
      }
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("corrupted sharded layout falls back to the shuffle, results unchanged") {
    val corpusDf = corpus(400).toDF("id", "embedding")
    val params = IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4)
    val qdf = (0L until 4L).map { qid =>
      val r = new scala.util.Random(qid * 7 + 5)
      (qid, Array.fill(dim)(r.nextFloat()))
    }.toDF("query_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_sharded_").toString
    try {
      VectorIndex.buildTo(corpusDf, params, numShards = 4, s"$dir/snap")
      val want = VectorIndex.load(spark, s"$dir/snap", cache = false)
        .query(qdf, 10, 0).select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      VectorIndex.relayoutSharded(spark, s"$dir/snap")
      // delete one shard dir: the one-file-per-shard invariant breaks
      graft.streaming.StreamingOps.deleteRecursively(
        s"$dir/snap/rows_sharded/sub_index_id=2")
      val idx = VectorIndex.load(spark, s"$dir/snap", cache = false)
      assert(idx.shardedLayoutDir.nonEmpty) // detected...
      val got = idx.query(qdf, 10, 0).select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(got === want, "...but the fallback must serve the full index")
      def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
        rdd.dependencies.exists {
          case _: org.apache.spark.ShuffleDependency[_, _, _] => true
          case d => hasShuffle(d.rdd)
        }
      assert(hasShuffle(idx.probeLayout), "fallback must be the shuffle layout")
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }
}

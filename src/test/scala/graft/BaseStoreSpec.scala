package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexParams, VectorIndex}
import graft.sources.BaseStore

/** Gates for the published full-precision base store ([[BaseStore]]) —
  * the disk-backed rerank relation of the refine tier:
  *  - publish → point-fetch returns EXACTLY the requested rows, bytes
  *    equal to the source corpus;
  *  - the IN predicate actually reaches the parquet scan (the whole
  *    point of the id-sorted small-page layout — a filter evaluated
  *    post-scan reads every page and the "point" fetch silently becomes
  *    a full scan);
  *  - [[VectorIndex.queryRefinedFromStore]] over the store ==
  *    [[VectorIndex.queryRefined]] over the live corpus, both fetch
  *    modes, and a STALE store (missing ids) throws instead of serving
  *    fewer neighbors. */
class BaseStoreSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def mkCorpus(n: Int, dim: Int) = (0L until n.toLong).map { id =>
    val r = new scala.util.Random(id * 2654435761L + 41)
    (id, Array.fill(dim)(r.nextFloat()))
  }

  test("publish + point fetch returns exactly the requested rows, identity sidecar round-trips") {
    val corpus = mkCorpus(5000, 8)
    val corpusDf = corpus.toDF("id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_bstore_").toString
    try {
      val corpusJson = """{"n":5000,"dim":8,"gen":"spec"}"""
      BaseStore.publish(corpusDf, s"$dir/base", files = 8, corpusJson)
      assert(BaseStore.publishedCount(spark, s"$dir/base") === 5000L)
      assert(BaseStore.publishedCorpus(spark, s"$dir/base") === corpusJson)
      val wanted = Seq(3L, 17L, 999L, 1024L, 4999L, 0L)
      val got = BaseStore.fetch(spark, s"$dir/base", wanted)
        .as[(Long, Array[Float])].collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(got.keySet === wanted.toSet)
      val src = corpus.toMap
      wanted.foreach(id => assert(got(id) === src(id).toSeq,
        s"fetched embedding for id $id differs from the published one"))
      // assumeSorted fast path: a source already range-partitioned with
      // ascending ids per partition (the decade generator's shape) must
      // publish WITHOUT the corpus-sized shuffle and fetch identically
      val sorted = spark.range(0L, 5000L, 1L, 4).rdd.map { id =>
        val r = new scala.util.Random(id * 2654435761L + 41)
        (id, Array.fill(8)(r.nextFloat()))
      }.toDF("id", "embedding")
      BaseStore.publish(sorted, s"$dir/base2", assumeSorted = true)
      val got2 = BaseStore.fetch(spark, s"$dir/base2", wanted)
        .as[(Long, Array[Float])].collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(got2 === got, "sorted-path store must fetch identically")
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("a non-object corpus identity is refused at publish time") {
    // same contract as IvfPqSnapshot.writeParams: a bare string would
    // splice invalid JSON that publishedCorpus reads back as "" — every
    // consumer's corpus require would pass vacuously
    val corpusDf = mkCorpus(100, 4).toDF("id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_bstore_").toString
    try {
      val e = intercept[IllegalArgumentException] {
        BaseStore.publish(corpusDf, s"$dir/bad", files = 2,
          corpusJson = "abc123")
      }
      assert(e.getMessage.contains("JSON OBJECT"))
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("the fetch's IN predicate reaches the parquet scan as a pushed filter") {
    val corpusDf = mkCorpus(2000, 4).toDF("id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_bstore_").toString
    try {
      BaseStore.publish(corpusDf, s"$dir/base", files = 4)
      // 64 ids — far above the default inFilterThreshold (10), i.e. the
      // regime where Spark emits the parquet-NATIVE in() predicate
      // (at/below the threshold it nests or(eq, …) chains instead, which
      // stack-overflow near 10³ values — fetch leaves the default alone)
      val ids = (0 until 64).map(i => (i * 31L) % 2000L).distinct
      val df = BaseStore.fetch(spark, s"$dir/base", ids)
      val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        .find(_.contains("PushedFilters")).getOrElse(
          fail("no scan node with PushedFilters in the fetch plan"))
      assert(scan.contains("In(id"),
        s"the IN predicate must be pushed to parquet, got: ${scan.take(400)}")
      assert(df.count() === ids.length.toLong)
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("queryRefinedFromStore == queryRefined over the live corpus; stale store throws") {
    val dim = 8
    val corpus = mkCorpus(800, dim)
    val corpusDf = corpus.toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
        quantized = true, quantLo = 0f, quantHi = 1f), numShards = 4)
    val qdf = (0L until 5L).map { qid =>
      val r = new scala.util.Random(qid * 104729 + 7)
      (qid, Array.fill(dim)(r.nextFloat()))
    }.toDF("query_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_bstore_").toString
    try {
      BaseStore.publish(corpusDf, s"$dir/base", files = 4)
      val want = idx.queryRefined(qdf, corpusDf, k = 10, pool = 40,
          searchWidth = 4)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      for (mode <- Seq("point", "scan")) {
        val got = idx.queryRefinedFromStore(qdf, s"$dir/base", k = 10,
            pool = 40, searchWidth = 4, fetch = mode)
          .select("query_id", "rank", "neighbor_id")
          .as[(Long, Int, Long)].collect().toSet
        assert(got === want, s"store-backed refine ($mode) must equal the " +
          "live-corpus refine bit-for-bit")
      }
      // stale store: republish WITHOUT the top half of the ids — every
      // pool that references one must refuse, not degrade
      BaseStore.publish(corpusDf.filter($"id" < 400), s"$dir/stale", files = 2)
      val e = intercept[Exception] {
        idx.queryRefinedFromStore(qdf, s"$dir/stale", k = 10, pool = 40,
          searchWidth = 4).collect()
      }
      assert(e.getMessage.contains("covers only"),
        s"stale store must trip the coverage guard: ${e.getMessage}")
      intercept[RuntimeException] {
        idx.queryRefinedFromStore(qdf, s"$dir/base", k = 10, pool = 40,
          searchWidth = 4, fetch = "mmap")
      }
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-pipeline scale benchmark — the dedup/BM25 counterpart of the ANN
  * decade runs (BASELINE.md / SCALE.md): synthesizes an N-document corpus
  * DISTRIBUTED (per-id seeded generation inside the executors, the
  * KernelBench `dist` pattern — nothing corpus-sized on the driver), then
  * times the two corpus-scale text kernels end to end, recording wall
  * time AND total shuffle volume (the quantity that decides 100 TB
  * feasibility) via a stage-metrics listener:
  *
  *  1. MinHash-LSH candidate pairs (d3's plan:
  *     [[graft.operators.Dedup.minHashCandidatePairsFromShingles]]) —
  *     shingle → per-doc signature (one digest pass) → banded buckets →
  *     bucket self-join. ~5% of docs are planted near-duplicates
  *     (deterministic mutations of a base doc) so the LSH has real work.
  *  2. BM25 posting-index build (v46's plan:
  *     [[graft.operators.HybridRetrieval.bm25Index]]) with the 78% df
  *     cap — map-side tf postings + the distributed vocab-df join.
  *
  * Run: sbt "runMain graft.TextBench [nDocs]"  (default 1,000,000).
  */
object TextBench {

  /** Deterministic per-id synthetic doc (shared with [[HybridServeBench]]
    * so both benches measure the same corpus semantics): Zipf-ish vocab
    * (nested nextInt skews toward low word ids — a realistic df
    * distribution with true stopwords for the df cap to bite on), 40-120
    * tokens; every 20th id block shares a base doc and ids ending in 8/9
    * within the block are MUTATIONS of that base (2 token swaps) —
    * planted near-duplicates the LSH must bucket together. */
  private[graft] def docText(id: Long): String = {
    val baseId = id - id % 20
    val isMut = (id % 20) >= 18
    val seedId = if (isMut) baseId else id
    val r = new scala.util.Random(seedId * 2654435761L + 17)
    val len = 40 + r.nextInt(81)
    val toks = Array.fill(len)("w" + r.nextInt(r.nextInt(49999) + 1))
    if (isMut) {
      val rm = new scala.util.Random(id * 2654435761L + 29)
      toks(rm.nextInt(len)) = "w" + rm.nextInt(50000)
      toks(rm.nextInt(len)) = "w" + rm.nextInt(50000)
    }
    toks.mkString(" ")
  }


  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shufWrite = new AtomicLong()
    val shufRead = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    // deterministic per-id synthetic docs: Zipf-ish vocab (nested nextInt
    // skews toward low word ids — a realistic df distribution with true
    // stopwords for the df cap to bite on), 40-120 tokens; every 20th id
    // block shares a base doc and ids ending in 8/9 within the block are
    // MUTATIONS of that base (2 token swaps) — planted near-duplicates
    // the LSH must bucket together
    val docs = spark.range(n).rdd
      .map(id => (id, docText(id)))
      .toDF("doc_id", "text")

    // stage-completion events arrive on Spark's ASYNC listener bus — drain
    // it before reading the counters or a phase's last stages get counted
    // into the next phase (or dropped from the final total). The bus is
    // private[spark], which is public at the bytecode level — reflection
    // keeps this bench-only dependency out of the library surface.
    def drainListenerBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        try bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        catch {
          case _: NoSuchMethodException =>
            bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
              .invoke(bus, Long.box(30000L))
        }
      } catch { case _: Throwable => Thread.sleep(2000) }

    def phase[T](name: String)(body: => T): T = {
      drainListenerBus()
      val w0 = shufWrite.get(); val r0 = shufRead.get()
      val t0 = System.nanoTime()
      val out = body
      val secs = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      println(f"$name: $secs%.1f s wall, " +
        f"shuffle write ${(shufWrite.get() - w0) / 1e9}%.2f GB / " +
        f"read ${(shufRead.get() - r0) / 1e9}%.2f GB")
      out
    }

    // --- 1. MinHash-LSH candidate pairs (d3's plan at production params) ---
    val nPairs = phase(s"minhash-lsh dedup ($n docs)") {
      val sh = graft.operators.Dedup.shingled(docs, n = 3)
      // d3's gated parameters (6 hashes from one md5 digest, 3 bands of
      // 2) — the single-digest slicing is itself the scale optimization
      graft.operators.Dedup
        .minHashCandidatePairsFromShingles(sh, numHashes = 6, bandSize = 2)
        .count()
    }
    println(s"  candidate pairs: $nPairs (planted ~${n / 10} near-dup docs)")

    // --- 2/3. BM25 posting index (v46's plan, 78% df cap) ---
    val maxDf = n * 78L / 100L
    val (index, stats) =
      graft.operators.HybridRetrieval.bm25Index(docs, maxTokenDf = maxDf)
    if (!args.contains("persist")) {
      val (nPostings, nDocs) = phase(s"bm25 index build ($n docs)") {
        (index.count(), stats.select(col("n_docs")).head.getLong(0))
      }
      println(s"  postings kept: $nPostings over $nDocs docs")
    } else {
      // the v55 lifecycle at scale, measured as production actually runs
      // it: ONE pass builds the postings straight into the snapshot write
      // (no separate count-then-save — the uncached build would re-run
      // wholesale inside the save), then serving loads the snapshot. The
      // number that justifies save/load is load+serve vs build+save.
      val dir = java.nio.file.Files.createTempDirectory("graft_bm25_snap_").toString
      phase(s"bm25 index build+save ($n docs, split-df layout)") {
        val (p, d, st) = graft.operators.HybridRetrieval.bm25SnapshotPieces(docs)
        graft.operators.HybridRetrieval.saveBm25Index(p, d, st, dir,
          dfCapNum = 78L, dfCapDen = 100L)
      }
      val du = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
      println(f"  snapshot size: ${du / 1e9}%.2f GB parquet")
      // queries = prefixes of 100 corpus docs (deterministic, hit-bearing)
      val queries = (0L until 100L).map { qid =>
        (qid, docText(qid * (n / 100)).split(" ").take(8).mkString(" "))
      }.toDF("query_id", "text")
      val (li, lstats) = graft.operators.HybridRetrieval.loadBm25Index(spark, dir)
      val nPostings = phase("bm25 snapshot load + full count") { li.count() }
      // serve measured SEPARATELY from the full-scan count: the serve
      // resolves the batch's under-cap tokens against the vocab-sized
      // df table first, then pushes that set into the posting scan
      // (tok_bkt partition dirs + In(tok) row groups), so its cost
      // tracks the MATCHED postings, not the snapshot size
      val snap = graft.operators.HybridRetrieval.openBm25Index(spark, dir)
      val nServed = phase("bm25 serve only, 100-query batch (pruned scan)") {
        graft.operators.HybridRetrieval.bm25Serve(queries, snap, n = 10).count()
      }
      val nServed5 = phase("bm25 serve only, 5-query batch (pruned scan)") {
        graft.operators.HybridRetrieval.bm25Serve(
          queries.filter(col("query_id") < 5), snap, n = 10).count()
      }
      println(s"  postings kept: $nPostings; served rows: $nServed (100q) / $nServed5 (5q)")
      // --- append lifecycle: publish the NEXT snapshot from a 1% batch.
      // Every base posting file is kept (hardlinked, zero bytes); only
      // the batch's posting files + the vocab-sized df table + stats are
      // written. The number to put next to the full build+save above.
      val appendDocs = spark.range(n.toLong, n.toLong + n.toLong / 100).rdd
        .map(id => (id, docText(id)))
        .toDF("doc_id", "text")
      val dir2 = java.nio.file.Files.createTempDirectory("graft_bm25_app_").toString + "/next"
      phase(s"bm25 appendBm25 (${n / 100} docs into $n, publish next snapshot)") {
        graft.operators.HybridRetrieval.appendBm25(spark, dir, appendDocs, dir2)
      }
      val (linked, written) = {
        import scala.jdk.CollectionConverters._
        val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir2))
          .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toSeq
        val byLinks = fs.partition(p =>
          java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] > 1)
        (byLinks._1.size -> byLinks._1.map(java.nio.file.Files.size).sum,
          byLinks._2.size -> byLinks._2.map(java.nio.file.Files.size).sum)
      }
      println(f"  appended snapshot: ${linked._1}%d files hardlinked " +
        f"(${linked._2 / 1e9}%.2f GB zero-byte), ${written._1}%d files written " +
        f"(${written._2 / 1e9}%.2f GB)")
      val snap2 = graft.operators.HybridRetrieval.openBm25Index(spark, dir2)
      val nServedApp = phase("bm25 serve from appended snapshot (100q)") {
        graft.operators.HybridRetrieval.bm25Serve(queries, snap2, n = 10).count()
      }
      println(s"  served rows from appended snapshot: $nServedApp")
      // --- STREAMED append-publish: the same-sized window arriving as
      // micro-batches publishes the NEXT generation of the 10M base via
      // appendBm25Pieces (v63's gated path) — the long-lived-ingest
      // lifecycle should pay append cost (~the batch appendBm25 line
      // above), never rebuild cost (the build+save line at the top).
      // streamBm25Ingest runs ingest + publish EAGERLY and returns the
      // lazy serve over the loaded generation, so the two phases below
      // separate (ingest+publish) from (serve).
      val winSrc = java.nio.file.Files
        .createTempDirectory("graft_bm25_win_").toString
      spark.range(n + n / 100, n + 2 * (n / 100)).rdd
        .map(id => (id, docText(id))).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(winSrc)
      val dir3 = java.nio.file.Files
        .createTempDirectory("graft_bm25_sapp_").toString + "/gen2"
      val servedStream = phase(
        s"bm25 STREAMED ingest + append-publish (${n / 100} docs into $n)") {
        graft.streaming.StreamingOps.streamBm25Ingest(spark, winSrc,
          corpusPred = lit(true), queries = queries, n = 10,
          sourceSlices = 4, publishPath = dir3, appendBasePath = dir)
      }
      val nServedStream = phase("bm25 serve from streamed-append generation (100q)") {
        servedStream.count()
      }
      println(s"  served rows from streamed-append generation: $nServedStream")
      // --- SECOND streamed window: the next generation chains off the
      // STREAMED generation (gen2 -> gen3), not off the batch base — the
      // long-lived-ingest steady state. Cap ratio and bucket count are
      // inherited transitively; cost should repeat the first window's
      // append cost (each generation hardlinks ALL accumulated posting
      // files — the linked-file count grows, the bytes written stay
      // O(window)). The two-window chain == one rebuild equality is
      // spec-gated (HybridRetrievalSpec streamed-chain test); this
      // phase prices it at scale.
      val winSrc2 = java.nio.file.Files
        .createTempDirectory("graft_bm25_win2_").toString
      spark.range(n + 2 * (n / 100), n + 3 * (n / 100)).rdd
        .map(id => (id, docText(id))).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(winSrc2)
      val dir4 = java.nio.file.Files
        .createTempDirectory("graft_bm25_sapp2_").toString + "/gen3"
      val servedStream2 = phase(
        s"bm25 STREAMED window 2 -> gen3 (${n / 100} docs into gen2)") {
        graft.streaming.StreamingOps.streamBm25Ingest(spark, winSrc2,
          corpusPred = lit(true), queries = queries, n = 10,
          sourceSlices = 4, publishPath = dir4, appendBasePath = dir3)
      }
      val nServedStream2 = phase("bm25 serve from gen3 (100q)") {
        servedStream2.count()
      }
      val (linked3, written3) = {
        import scala.jdk.CollectionConverters._
        val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir4))
          .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toSeq
        val byLinks = fs.partition(p =>
          java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] > 1)
        (byLinks._1.size -> byLinks._1.map(java.nio.file.Files.size).sum,
          byLinks._2.size -> byLinks._2.map(java.nio.file.Files.size).sum)
      }
      println(f"  gen3: ${linked3._1}%d files hardlinked " +
        f"(${linked3._2 / 1e9}%.2f GB zero-byte), ${written3._1}%d files " +
        f"written (${written3._2 / 1e9}%.2f GB); served rows: $nServedStream2")
      try {
        import scala.jdk.CollectionConverters._
        Seq(dir, java.nio.file.Paths.get(dir2).getParent.toString,
            winSrc, java.nio.file.Paths.get(dir3).getParent.toString,
            winSrc2, java.nio.file.Paths.get(dir4).getParent.toString).foreach { d =>
          java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
            .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      } catch { case _: Throwable => }
    }
    drainListenerBus()
    println(f"TOTAL shuffle: write ${shufWrite.get() / 1e9}%.2f GB, " +
      f"read ${shufRead.get() / 1e9}%.2f GB")
    spark.stop()
  }
}

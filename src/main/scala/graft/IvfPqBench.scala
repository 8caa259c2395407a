package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfKnn, PqKnn}
import graft.functions.PqFunctions

/** IVF-PQ at the serving decade — the memory-cheapest serving face
  * (m bytes/vector vs SQ8's dim bytes and float's 4·dim) measured at
  * the same 100M×64d scale as the graph decade, on the SAME
  * deterministically regenerated corpus (KernelBench dist seed), so the
  * recall and ms/query numbers sit next to SQ8's in SCALE.md:
  *
  *  1. BUILD: trained coarse quantizer (Lloyd on a bounded deterministic
  *     sample — v56's trainedCentroids) + trained global PQ codebooks
  *     (v36's flavor; on uniform-random data the global codebook holds
  *     its own vs residual — the r15 finding), then ONE map-only encode
  *     pass over the corpus publishing the codes snapshot: (neighbor_id,
  *     cell, m-byte codes) parquet, cell-clustered (repartition + sort
  *     on cell) so serving prunes row groups via the pushed cell
  *     predicate — the BM25-snapshot discipline applied to ANN codes.
  *  2. SERVE from the LOADED snapshot: route the query batch to its
  *     nprobe nearest cells (per-row codegen argmin, no shuffle), push
  *     the batch's bounded cell set into the codes scan
  *     (`cell IN (…)`), ADC-score the admitted codes, one per-query
  *     top-k window. Swept over nprobe for the recall/latency trade.
  *  3. RECALL: float-exact ground truth over the regenerated corpus via
  *     the fused kNN operator (brute force IS cheap as a calibrator).
  *
  * Run: sbt "runMain graft.IvfPqBench [n] [dim] [numCents] [m]
  *   [codewords] [snapshotDir]"
  */
object IvfPqBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val numCents = args.lift(2).map(_.toInt).getOrElse(1024)
    val m = args.lift(3).map(_.toInt).getOrElse(8)
    val codewords = args.lift(4).map(_.toInt).getOrElse(256)
    val dir = args.lift(5).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString)
    val k = 10
    val nQueries = 100

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus = spark.range(n).rdd.mapPartitions { it =>
      it.map { id =>
        val r = new scala.util.Random(id * 2654435761L + 13)
        (id, Array.fill(dim)(r.nextFloat()))
      }
    }.toDF("id", "embedding")

    // --- build: train on a bounded deterministic sample ---
    val stride = math.max(1L, n / 100000L)
    // re-id CONTIGUOUSLY: the deterministic codeword/centroid samplers
    // stride over the id RANGE, so a sparse strided id set would sample
    // far fewer than numCodewords rows
    val sample = corpus.filter(pmod(col("id"), lit(stride)) === 0)
      .select((col("id") / stride).cast("long").as("id"), col("embedding"))
      .cache()
    println(s"training sample: ${sample.count()} rows (stride $stride)")
    val t0 = System.nanoTime()
    val cents = IvfKnn.trainedCentroids(sample, numCents, iterations = 3).cache()
    val nCells = cents.count() // stride sampling can yield slightly fewer
    println(f"coarse quantizer: $nCells%d trained cells (requested $numCents%d), " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val (flat, kEff, subDim) = PqKnn.trainCodebooks(sample, codewords, m, iterations = 3)
    println(f"pq codebooks: m=$m%d x $kEff%d codewords (subDim $subDim%d), " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s")
    sample.unpersist()

    // --- encode + publish the codes snapshot (one map pass) ---
    val t2 = System.nanoTime()
    IvfKnn.assign(corpus, cents)
      .select(col("id").as("neighbor_id"), col("cell"),
        PqFunctions.encode(col("embedding"), flat, m, kEff, subDim).as("codes"))
      .repartition(64, col("cell"))
      .sortWithinPartitions(col("cell"), col("neighbor_id"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    val buildS = (System.nanoTime() - t2) / 1e9
    val bytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$dir/codes"))
    }
    println(f"encode+publish: $n%d codes -> $buildS%.1f s, ${bytes / 1e9}%.2f GB parquet " +
      f"(${bytes.toDouble / n}%.1f B/vector incl. ids+cells; payload $m%d B/vector)")

    // --- exact ground truth (the 29 s calibrator at 100M) ---
    val queries = (0L until nQueries.toLong).map { id =>
      val r = new scala.util.Random(id * 2654435761L + 1)
      (id, Array.fill(dim)(r.nextFloat()))
    }
    val qdf = queries.toDF("query_id", "embedding").cache(); qdf.count()
    val t3 = System.nanoTime()
    val gt = graft.plans.KnnJoinPlan.knnFused(qdf, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"exact ground truth: ${(System.nanoTime() - t3) / 1e9}%.1f s (${gt.size} pairs)")

    // --- serve from the LOADED snapshot, nprobe sweep ---
    // Two stages, v22/v28's architecture at the decade: (1) ADC over the
    // admitted cells' codes keeps a per-query pool of C candidates in
    // approximate order; (2) EXACT rerank of the pool by true distance.
    // Because the rerank is exact, a ground-truth neighbor reaches the
    // final top-k iff it reached the pool — so final recall@k ==
    // |pool ∩ gt| / |gt|, and the pool stage carries ALL the recall
    // risk. The rerank's vector fetch runs here as one regeneration pass
    // over the deterministic corpus joined to the bounded pool (at
    // 100 TB this is |Q|·C point reads from the vector store — the
    // corpus pass is this bench's stand-in for that storage).
    val codes = spark.read.parquet(s"$dir/codes")
    val poolC = 50 * k
    val wPool = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("distance"), col("neighbor_id"))
    for (nprobe <- Seq(numCents / 128, numCents / 32, numCents / 8)
        .map(math.max(1, _)).distinct) {
      // the ADC timer starts HERE: routing, ADC-table construction, and
      // the probed-cell collect are per-batch serving work a deployment
      // pays every time — excluding them would understate the serve
      val t4 = System.nanoTime()
      val routed = IvfKnn.route(qdf, cents, nprobe)
        .select(col("query_id"), col("cell"),
          PqFunctions.adcTable(col("q_embedding"), flat, m, kEff, subDim).as("tab"))
        .cache()
      // the batch's bounded probed-cell set becomes a REAL pushed
      // predicate on the cell-clustered snapshot (row-group pruning) —
      // a broadcast join alone would scan every code
      val cells = routed.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val pool = codes.filter(col("cell").isin(cells: _*))
        .join(broadcast(routed), Seq("cell"))
        .select(col("query_id"), col("neighbor_id"),
          PqFunctions.adcLookup(col("tab"), col("codes"), kEff).cast("double")
            .as("distance"))
        .withColumn("rank", row_number().over(wPool)).filter(col("rank") <= poolC)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val poolS = (System.nanoTime() - t4) / 1e9
      // exact rerank: fetch pool vectors (regeneration pass == the point
      // reads), true distance, final top-k
      val t5 = System.nanoTime()
      val fetched = corpus.join(broadcast(pool), col("id") === col("neighbor_id"))
      val reranked = fetched
        .join(broadcast(qdf.select(col("query_id"), col("embedding").as("qe"))),
          Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.VectorFunctions.squaredL2(col("qe"), col("embedding"))
            .as("distance"))
        .withColumn("rank", row_number().over(wPool)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rerankS = (System.nanoTime() - t5) / 1e9
      val recall = (gt intersect reranked).size.toDouble / gt.size
      println(f"serve nprobe=$nprobe%4d (${cells.size}%d cells, pool $poolC%d): " +
        f"adc $poolS%.1f s + rerank $rerankS%.1f s for $nQueries%d queries = " +
        f"${(poolS + rerankS) * 1000 / nQueries}%.1f ms/query, recall@$k%d = $recall%.3f")
      routed.unpersist()
    }
    println(s"snapshot kept at $dir")
    spark.stop()
  }
}

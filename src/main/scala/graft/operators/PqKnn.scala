package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions

/** Product-quantized approximate kNN (see [[graft.functions.PqEncode]]
  * for the codec contract). Scale shape:
  *
  *  - the corpus is encoded ONCE, map-only, into `m` bytes per vector —
  *    at d=64/m=8 that is 32x less candidate state than float32, so the
  *    code table (id + 8 bytes) is what flows through any downstream
  *    shuffle, cache, or index, never the embeddings;
  *  - queries precompute an m x k ADC table each (one narrow projection)
  *    and broadcast; per-candidate scoring is m byte-indexed adds —
  *    independent of the original dimension;
  *  - top-k uses the same rank-window Spark rewrites to WindowGroupLimit
  *    (partial per partition), so the shuffle carries O(|Q| x parts x k).
  *
  * Codebooks are deterministically sampled corpus rows (id % stride == 0,
  * the IVF sampling rule — no RNG), so the whole pipeline has an exact
  * SQL oracle; a k-means-trained codebook plugs into the same flat-array
  * slot without changing any plumbing. PQ is lossy: recall is bounded in
  * the spec, while the oracle pins that the ENGINE computes this exact
  * quantization bit-for-bit. */
object PqKnn {

  /** Deterministic flat codebook from sampled corpus rows.
    * @return (flat subspace-major floats, effective k, subDim) */
  def codebooks(corpus: DataFrame, numCodewords: Int, m: Int,
      maxCodewords: Int = 256): (Array[Float], Int, Int) = {
    val dim = corpus.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dimension $dim not divisible into $m subspaces")
    val subDim = dim / m
    val maxId = corpus.agg(max(col("id"))).head.getLong(0)
    val stride = math.max((maxId + numCodewords) / numCodewords, 1L)
    // bounded collect: ~numCodewords sampled rows (the codebook IS the
    // small literal state, like the IVF centroid table)
    val sampled = corpus.filter(col("id") % stride === 0)
      .orderBy(col("id")).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sampled.nonEmpty, "empty corpus sample — no codebook")
    // the 256 ceiling is a property of the BYTE-coded PQ encoder, not of
    // the Lloyd kernel — [[IvfKnn.trainedCentroids]] (m=1 coarse cells,
    // Long ids via argmin, nothing ever byte-coded) lifts it
    require(sampled.length <= maxCodewords,
      s"codebook of ${sampled.length} exceeds the $maxCodewords-codeword bound")
    val k = sampled.length
    val flat = new Array[Float](m * k * subDim)
    for (j <- 0 until k; s <- 0 until m; i <- 0 until subDim)
      flat((s * k + j) * subDim + i) = sampled(j)(s * subDim + i)
    (flat, k, subDim)
  }

  /** K-means-TRAINED codebooks (Lloyd iterations from the deterministic
    * sampled init): the recall upgrade over [[codebooks]] — sampling keeps
    * the exact SQL oracle, training closes the recall gap. Deterministic
    * end to end: assignment uses the same strict-argmin as the encoder,
    * partials fold in a FIXED pid-keyed hierarchy (below), and an empty
    * cluster keeps its previous codeword. Requires an `id` column — it
    * keys the accumulation layout.
    *
    * Scale shape: each iteration is one map-only pass over the corpus
    * emitting ONE partial-sums row per partition (no shuffle of vectors,
    * no per-row state on the driver — the one up-front shuffle fixes the
    * accumulation layout), then a deterministic hierarchical fold:
    * partials group by pid/32, each group folds in ascending-pid order,
    * group ids become the next level's pids — O(log_32 P) tiny shuffle
    * rounds, and exactly ONE ~8 KB partial ever reaches the driver, at
    * any partition count (the round-8 review flagged the per-iteration
    * collect of all partials; at the default 32 partitions this fold is
    * bit-identical to the old sequential one).
    *
    * The corpus is laid out ONCE into a fixed id-keyed partitioning
    * (`numPartitions`, sorted by id within each) before the passes:
    * double-sum accumulation order is then a function of the DATA alone,
    * not of core count or file-split boundaries, so trained codebooks
    * are bit-identical on any cluster size at a given `numPartitions`. */
  def trainCodebooks(corpus: DataFrame, numCodewords: Int, m: Int,
      iterations: Int = 5, numPartitions: Int = 32,
      maxCodewords: Int = 256): (Array[Float], Int, Int) = {
    require(corpus.columns.contains("id"),
      "trainCodebooks requires an 'id' column: it keys the deterministic accumulation layout")
    var (flat, k, subDim) = codebooks(corpus, numCodewords, m, maxCodewords)
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col("id"), col("embedding"))
      .repartition(numPartitions, pmod(col("id"), lit(numPartitions)))
      .sortWithinPartitions(col("id"))
      .select(col("embedding")).as[Array[Float]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iterations) {
        val cb = flat // stable reference for the closure
        var partials = vecs.rdd.mapPartitionsWithIndex { (pid, it) =>
          val sums = new Array[Double](m * k * subDim)
          val counts = new Array[Long](m * k)
          it.foreach { v =>
            var s = 0
            while (s < m) {
              var bestD = Double.PositiveInfinity
              var bestJ = 0
              var j = 0
              while (j < k) {
                val off = (s * k + j) * subDim
                var acc = 0.0
                var i = 0
                while (i < subDim) {
                  val t = v(s * subDim + i).toDouble - cb(off + i).toDouble
                  acc += t * t
                  i += 1
                }
                if (acc < bestD) { bestD = acc; bestJ = j }
                j += 1
              }
              val off = (s * k + bestJ) * subDim
              var i = 0
              while (i < subDim) { sums(off + i) += v(s * subDim + i).toDouble; i += 1 }
              counts(s * k + bestJ) += 1
              s += 1
            }
          }
          Iterator.single((pid, (sums, counts)))
        }
        // deterministic hierarchical fold: group by pid/32, fold each
        // group in ascending-pid order (groupByKey materializes the whole
        // group before the fold, so arrival order never matters), repeat
        // with group ids as pids until one partial remains
        val fanIn = 32
        var width = numPartitions
        while (width > 1) {
          val groups = (width + fanIn - 1) / fanIn
          partials = partials
            .map { case (pid, p) => (pid / fanIn, (pid, p)) }
            .groupByKey(groups)
            .mapValues { members =>
              val sorted = members.toArray.sortBy(_._1)
              val s0 = new Array[Double](m * k * subDim)
              val c0 = new Array[Long](m * k)
              sorted.foreach { case (_, (ps, pc)) =>
                var i = 0
                while (i < s0.length) { s0(i) += ps(i); i += 1 }
                i = 0
                while (i < c0.length) { c0(i) += pc(i); i += 1 }
              }
              (s0, c0)
            }
          width = groups
        }
        val (sums, counts) = partials.values.collect().head
        val next = flat.clone()
        for (s <- 0 until m; j <- 0 until k if counts(s * k + j) > 0) {
          val off = (s * k + j) * subDim
          val n = counts(s * k + j).toDouble
          var i = 0
          while (i < subDim) { next(off + i) = (sums(off + i) / n).toFloat; i += 1 }
        }
        flat = next
      }
    } finally vecs.unpersist() // release the cache on the throw path too
    (flat, k, subDim)
  }

  /** PQ-approximate kNN join over an explicit codebook. */
  def knnJoinWith(queries: DataFrame, corpus: DataFrame, k: Int,
      flat: Array[Float], kEff: Int, subDim: Int, m: Int): DataFrame = {
    val codes = corpus.select(col("id").as("neighbor_id"),
      PqFunctions.encode(col("embedding"), flat, m, kEff, subDim).as("codes"))
    val qTab = queries.select(col("query_id"),
      PqFunctions.adcTable(col("embedding"), flat, m, kEff, subDim).as("tab"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("neighbor_id"))
    codes.crossJoin(broadcast(qTab))
      .select(col("query_id"), col("neighbor_id"),
        PqFunctions.adcLookup(col("tab"), col("codes"), kEff).as("distance"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
  }

  /** PQ-approximate kNN join: (query_id, rank, neighbor_id, distance)
    * where distance is the exact ADC value of the quantized corpus. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int, numCodewords: Int): DataFrame = {
    val (flat, kEff, subDim) = codebooks(corpus, numCodewords, m)
    knnJoinWith(queries, corpus, k, flat, kEff, subDim, m)
  }

  /** IVF-PQ kNN (the FAISS `IVFPQ` composition, flat-codebook flavor):
    * the coarse quantizer prunes the scan to the `nprobe` nearest cells
    * per query and PQ scores only those cells' members — the two
    * approximations multiply, which is the standard billion-scale ANN
    * architecture.
    *
    * Scale shape on top of the pieces it composes
    * ([[graft.operators.IvfKnn]] cell argmin, the PQ codec here):
    *  - corpus state after the map-only encode is `(id, cell, m bytes)`
    *    — the float embeddings never leave their scan;
    *  - the probe join broadcasts ONLY per-(query, cell) ADC tables
    *    (m x k doubles, ~1 KB each — `|Q| x nprobe` of them), never the
    *    query embeddings;
    *  - the cell equi-join replaces v27's crossJoin: candidate volume
    *    drops by ~numCentroids/nprobe, and the one hash exchange remains
    *    the rank window's `query_id` partitioning.
    *
    * Both quantizers stay deterministic (sampled centroids, explicit
    * codebook), so the whole composition has an exact SQL oracle
    * (v29_ivfpq). Trained codebooks ([[trainCodebooks]]) drop into the
    * same slot. */
  def ivfKnnJoinWith(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nprobe: Int,
      flat: Array[Float], kEff: Int, subDim: Int, m: Int): DataFrame = {
    val cents = IvfKnn.centroids(corpus, numCentroids)
    val codes = IvfKnn.assign(corpus, cents)
      .select(col("id").as("neighbor_id"), col("cell"),
        PqFunctions.encode(col("embedding"), flat, m, kEff, subDim).as("codes"))
    val routed = IvfKnn.route(queries, cents, nprobe)
      .select(col("query_id"), col("cell"),
        PqFunctions.adcTable(col("q_embedding"), flat, m, kEff, subDim).as("tab"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("neighbor_id"))
    codes.join(broadcast(routed), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        PqFunctions.adcLookup(col("tab"), col("codes"), kEff).as("distance"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
  }

  /** Residual corpus for a centroid set: `(id, cell, embedding := x -
    * centroid(cell(x)))`. Float32 subtraction (both engines round it
    * identically), cells from the same per-row codegen'd argmin as
    * [[IvfKnn.assign]]; the bounded centroid table broadcasts. */
  def residuals(corpus: DataFrame, cents: DataFrame): DataFrame =
    residualsAssigned(IvfKnn.assign(corpus, cents), cents)

  /** [[residuals]] over a PRE-ASSIGNED (id, embedding, cell) frame — the
    * slot that lets the encode pipeline swap the flat-argmin assignment
    * for [[IvfKnn.routedAssign]] (graph-routed, O(beam) per row) without
    * touching the residual projection. */
  def residualsAssigned(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned
      .join(broadcast(cents), col("cell") === col("centroid_id"))
      .select(col("id"), col("cell"),
        zip_with(col("embedding"), col("c_embedding"), (x, c) => x - c)
          .as("embedding"))

  /** Residual-encoded IVF-PQ (the faithful FAISS `IVFPQ`): PQ encodes
    * the RESIDUAL `x - centroid(cell(x))` instead of `x` itself, and a
    * query builds one ADC table per probed cell from `q - centroid`.
    * The regime where residual coding pays: MANY coarse cells relative
    * to the codeword budget. A global codebook cannot place a codeword
    * near every cell, so its ADC error is on the scale of inter-cell
    * distances; residuals all live in a tight ball around the origin and
    * the same bytes approximate intra-cell geometry — measured in
    * PqKnnSpec (64 clusters, 16 codewords): mean |ADC - true| ~250x
    * smaller than [[ivfKnnJoinWith]]'s global flavor. On structureless
    * data (uniform-random embeddings, sparse centroids) the residual
    * distribution is WIDER than the data and the global codebook
    * legitimately holds its own — on this repo's synthetic testdata,
    * global pool-40 recall 0.42 vs residual 0.35. Both directions are
    * facts; pick by corpus shape. The identity
    * `|x - q|^2 = |(x - c) - (q - c)|^2` holds within each cell, so ADC
    * in residual space approximates the same metric either way.
    *
    * Scale shape is unchanged from [[ivfKnnJoinWith]]: corpus state after
    * the map-only encode is `(id, cell, m bytes)`; the probe broadcasts
    * per-(query, cell) ADC tables; one hash exchange (the rank window).
    * The residual computation itself is a per-row projection against the
    * broadcast centroid table — no extra shuffle anywhere.
    *
    * Codebooks are the deterministic id-stride sample over RESIDUAL rows
    * (same rule as [[codebooks]]), so the composition keeps an exact SQL
    * oracle (v30_ivfpq_residual); [[trainCodebooks]] on the residual
    * frame is the drop-in production upgrade. */
  def ivfPqResidualJoin(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nprobe: Int, numCodewords: Int, m: Int): DataFrame = {
    val cents = IvfKnn.centroids(corpus, numCentroids)
    val resid = residuals(corpus, cents)
    val (flat, kEff, subDim) = codebooks(resid, numCodewords, m)
    ivfPqResidualJoinWith(queries, corpus, k, cents, resid, nprobe,
      flat, kEff, subDim, m)
  }

  /** [[ivfPqResidualJoin]] over explicit centroid/residual/codebook state
    * (for callers that cache the calibration). */
  def ivfPqResidualJoinWith(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: DataFrame, resid: DataFrame, nprobe: Int,
      flat: Array[Float], kEff: Int, subDim: Int, m: Int): DataFrame = {
    val codes = resid.select(col("id").as("neighbor_id"), col("cell"),
      PqFunctions.encode(col("embedding"), flat, m, kEff, subDim).as("codes"))
    val routed = IvfKnn.route(queries, cents, nprobe)
      .join(broadcast(cents), col("cell") === col("centroid_id"))
      .select(col("query_id"), col("cell"),
        PqFunctions.adcTable(
          zip_with(col("q_embedding"), col("c_embedding"), (q, c) => q - c),
          flat, m, kEff, subDim).as("tab"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("neighbor_id"))
    codes.join(broadcast(routed), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        PqFunctions.adcLookup(col("tab"), col("codes"), kEff).as("distance"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
  }
}

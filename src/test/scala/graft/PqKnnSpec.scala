package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PqFunctions
import graft.operators.PqKnn

/** Product-quantized kNN: compression factor, encode/ADC consistency with
  * a Scala reference, and bounded recall against exact search. */
class PqKnnSpec extends AnyFunSuite with SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val corpus = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("codes are m bytes per vector (32x smaller than float32 at d=64, m=8)") {
    val (flat, k, subDim) = PqKnn.codebooks(corpus, numCodewords = 16, m = 8)
    assert(subDim == 8 && k >= 2 && k <= 16 && flat.length == 8 * k * 8)
    val lens = corpus
      .select(length(PqFunctions.encode(col("embedding"), flat, 8, k, subDim)).as("n"))
      .distinct().collect()
    assert(lens.length == 1 && lens(0).getInt(0) == 8)
  }

  test("encode + ADC lookup equal a direct Scala recomputation") {
    val (flat, k, subDim) = PqKnn.codebooks(corpus, numCodewords = 16, m = 8)
    val m = 8
    def subL2(v: Array[Float], s: Int, j: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val t = v(s * subDim + i).toDouble - flat((s * k + j) * subDim + i).toDouble
        acc += t * t
        i += 1
      }
      acc
    }
    val rows = corpus.filter(col("id") < 20)
      .select(col("id"), col("embedding"),
        PqFunctions.encode(col("embedding"), flat, m, k, subDim).as("codes"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Float](1).toArray
      val codes = r.getAs[Array[Byte]](2).map(_ & 0xff)
      for (s <- 0 until m) {
        val best = (0 until k).minBy(j => (subL2(v, s, j), j))
        assert(codes(s) == best, s"id=${r.getLong(0)} subspace $s")
      }
    }
    // ADC of a query against those codes == sum of codeword sub-distances
    val q = queries.filter(col("query_id") === 0).head.getSeq[Float](1).toArray
    val got = corpus.filter(col("id") < 20)
      .select(col("id"),
        PqFunctions.adcLookup(
          PqFunctions.adcTable(typedLit(q.toSeq), flat, m, k, subDim),
          PqFunctions.encode(col("embedding"), flat, m, k, subDim), k).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- rows) {
      val codes = r.getAs[Array[Byte]](2).map(_ & 0xff)
      val expect = (0 until m).map(s => subL2(q, s, codes(s))).sum
      assert(math.abs(got(r.getLong(0)) - expect) == 0.0, s"id=${r.getLong(0)}")
    }
  }

  test("PQ expressions fail loudly on length mismatches (no silent garbage reads)") {
    val (flat, k, subDim) = PqKnn.codebooks(corpus, numCodewords = 16, m = 8)
    val m = 8
    // vector shorter than m*subDim: encode and adcTable must throw, not
    // read out-of-range UnsafeArrayData
    val short = corpus.select(slice(col("embedding"), 1, m * subDim - 1).as("embedding"))
    val e1 = intercept[Exception](
      short.select(PqFunctions.encode(col("embedding"), flat, m, k, subDim)).collect())
    assert(e1.getMessage.contains("expected") || e1.getCause != null &&
      e1.getCause.getMessage.contains("expected"))
    val e2 = intercept[Exception](
      short.select(PqFunctions.adcTable(col("embedding"), flat, m, k, subDim)).collect())
    assert(e2.getMessage.contains("expected") || e2.getCause != null &&
      e2.getCause.getMessage.contains("expected"))
    // ADC table length must equal k * |codes|
    val q = queries.filter(col("query_id") === 0).head.getSeq[Float](1).toArray
    val e3 = intercept[Exception](
      corpus.limit(5).select(PqFunctions.adcLookup(
        slice(PqFunctions.adcTable(typedLit(q.toSeq), flat, m, k, subDim), 1, k),
        PqFunctions.encode(col("embedding"), flat, m, k, subDim), k)).collect())
    assert(e3.getMessage.contains("expected") || e3.getCause != null &&
      e3.getCause.getMessage.contains("expected"))
  }

  test("PQ candidate generation is useful: pool recall well above chance, more codewords help") {
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(pool: Int, nc: Int): Double = {
      val pq = PqKnn.knnJoin(queries, corpus, k = pool, m = 8, numCodewords = nc)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect pq).size.toDouble / exact.size
    }
    // 16 sampled codewords x 8 subspaces is a deliberately coarse code;
    // its contract is candidate GENERATION — a 4x pool captures a large
    // share of the exact top-10 (rerank then recovers order, v22 pattern)
    val top10 = recallOf(10, 16)
    val pool40 = recallOf(40, 16)
    val corpusSize = corpus.count().toDouble
    assert(top10 > 10.0 / corpusSize * 3, s"top-10 recall $top10 no better than chance")
    assert(pool40 >= 0.35, s"pool-40 recall = $pool40")
    assert(pool40 > top10, "a bigger pool must not lose candidates")
    // a finer codebook strictly helps the pool
    assert(recallOf(40, 64) >= pool40, "64 codewords should not recall worse than 16")
    // the composed two-stage query (v28) converts pool recall into
    // top-10 recall: exact rerank can only surface what the pool holds,
    // and surfaces all of it
    val reranked = Queries.v28PqRerank(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerankRecall = (exact intersect reranked).size.toDouble / exact.size
    assert(rerankRecall >= pool40 - 1e-9,
      s"rerank recall $rerankRecall fell below its pool's $pool40")
    assert(rerankRecall >= top10, "rerank must not be worse than raw PQ top-10")
  }

  test("OPQ rotation: rotated PQ recall >= plain on a correlated corpus (v41 composition)") {
    import org.apache.spark.sql.{Column, DataFrame}
    import graft.functions.BinaryQuantFunctions
    import spark.implicits._
    // variance-imbalanced corpus (the rate-allocation case of OPQ, Ge
    // et al. CVPR'13 §1): every dim independent, but the first
    // subspace's 8 dims carry 20x the spread of the other 56 — plain PQ
    // burns subspace 0's 16 codewords on a high-variance 8-dim signal
    // (huge distortion) while subspaces 1-7 under-use theirs; the
    // Hadamard rotation balances per-coordinate variance so every
    // subspace's 4-bit budget works equally hard. (Keep the low-variance
    // dims INDEPENDENT, not constant: with flat tails the H8 x H8
    // Kronecker structure makes rotated PQ exactly equivalent to plain —
    // every rotated subspace becomes a signed copy of the same signal —
    // and the comparison degenerates to equality.)
    def unit(seed: Long): Float = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (((z ^ (z >>> 31)) >>> 40).toDouble / (1L << 24).toDouble).toFloat
    }
    val dim = 64
    def vec(row: Long): Array[Float] =
      Array.tabulate(dim)(j =>
        if (j < 8) unit(row * 131 + j) * 10f else unit(row * 131 + j) * 0.5f)
    val corr = (0L until 512L).map(i => (i, vec(i))).toDF("id", "embedding")
    val qs = (0L until 20L).map(i => (i, vec(i + 100000L))).toDF("query_id", "embedding")
    val exact = graft.operators.ExactKnn.knnJoin(qs, corr, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def rot(c: Column): Column =
      BinaryQuantFunctions.hadamard(c).cast("array<float>")
    def recallOf(q: DataFrame, c: DataFrame): Double = {
      // Lloyd-trained codebooks (the v36 trainer): with sampled-row
      // codebooks both codes collapse to coarse row-identity and the
      // comparison says nothing — training is what lets each subspace
      // learn its share of the (rotated) signal
      val (flat, kEff, subDim) = PqKnn.trainCodebooks(c, numCodewords = 16, m = 8)
      val got = PqKnn.knnJoinWith(q, c, k = 10, flat, kEff, subDim, m = 8)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val plain = recallOf(qs, corr)
    val rotated = recallOf(
      qs.select(col("query_id"), rot(col("embedding")).as("embedding")),
      corr.select(col("id"), rot(col("embedding")).as("embedding")))
    // deterministic data + deterministic training ⇒ exact values are
    // reproducible (measured 0.15 vs 0.325); the +0.1 margin asserts the
    // win is structural, not tie-break noise
    assert(rotated >= plain + 0.1,
      s"rotation should win decisively here: rotated $rotated vs plain $plain")
  }

  test("IVF-PQ equals plain PQ restricted to the probed cells' members") {
    import graft.operators.IvfKnn
    val (flat, kEff, subDim) = PqKnn.codebooks(corpus, numCodewords = 16, m = 8)
    val got = PqKnn.ivfKnnJoinWith(queries, corpus, k = 10,
        numCentroids = 8, nprobe = 3, flat, kEff, subDim, m = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // reference: all-pairs PQ distances, filtered to candidates whose
    // assigned cell is among the query's 3 probed cells, re-ranked
    val n = corpus.count().toInt
    val cents = IvfKnn.centroids(corpus, 8)
    val cellOf = IvfKnn.assign(corpus, cents).select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = IvfKnn.route(queries, cents, 3).select(col("query_id"), col("cell"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val expect = PqKnn.knnJoinWith(queries, corpus, k = n, flat, kEff, subDim, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .filter { case (q, id, _) => probed(q).contains(cellOf(id)) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(10).zipWithIndex
          .map { case ((_, id, d), i) => (q, i + 1, id, d) }
      }
    assert(got.sorted.toSeq == expect.sorted.toSeq)
    assert(got.nonEmpty && got.map(_._1).distinct.length == 10)
  }

  test("residual encoding approximates true distances far better when cells outnumber codewords") {
    // The IVFPQ regime: MANY coarse cells, few codewords. A global
    // codebook cannot place a codeword near every cell, so ADC error is
    // on the scale of inter-cell distances; residuals all live in a
    // tight ball around the origin, so the same byte budget approximates
    // intra-cell geometry. 64 well-separated clusters vs 16 codewords —
    // measured here, residual mean |ADC - true| is ~250x smaller. (On
    // this repo's uniform-random testdata there is no cluster structure,
    // residuals are WIDER than the data, and the global codebook
    // legitimately holds its own — both directions are facts.)
    import spark.implicits._
    import graft.operators.IvfKnn
    import graft.functions.VectorFunctions
    val dim = 16; val nClusters = 64; val perCluster = 32
    def center(g: Int): Array[Float] =
      Array.tabulate(dim)(i => (((g * 31 + i * 7) % 29) - 14).toFloat)
    def jitter(id: Long, i: Int): Float =
      ((((id * 2654435761L + i * 40503L) >>> 7) % 201L) - 100L) / 1000.0f // +-0.1
    // block layout: cluster g = id / perCluster, so the deterministic
    // id-stride centroid sample picks exactly one member per cluster
    val members = (0L until (nClusters * perCluster).toLong).map { id =>
      val g = (id / perCluster).toInt
      (id, center(g).zipWithIndex.map { case (c, i) => c + jitter(id, i) }.toSeq)
    }
    val cCorpus = members.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
    val qRows = (0 until 10).map { qi =>
      val (id, v) = members((qi * 6 % nClusters) * perCluster + 3 + qi)
      (id, v.map(x => x + 0.01f))
    }
    val cQueries = qRows.toDF("query_id", "embedding")
      .select(col("query_id"), col("embedding").cast("array<float>").as("embedding"))
    val truth = cCorpus
      .crossJoin(broadcast(cQueries.select(col("query_id"), col("embedding").as("qe"))))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.squaredL2(col("qe"), col("embedding")).as("td"))
    def adcErrOf(df: org.apache.spark.sql.DataFrame): Double =
      df.join(truth, Seq("query_id", "neighbor_id"))
        .select(abs(col("distance") - col("td")).as("e"))
        .agg(avg("e")).head.getDouble(0)
    // identical (cells, nprobe, m, codewords) budget isolates the codec;
    // k = corpus size scores every probed candidate, not just a top slice
    val n = nClusters * perCluster
    val (gFlat, gK, gSd) = PqKnn.codebooks(cCorpus, numCodewords = 16, m = 8)
    val globalErr = adcErrOf(PqKnn.ivfKnnJoinWith(cQueries, cCorpus, k = n,
      numCentroids = 64, nprobe = 2, gFlat, gK, gSd, m = 8))
    val cents = IvfKnn.centroids(cCorpus, 64)
    val resid = PqKnn.residuals(cCorpus, cents)
    val (rFlat, rK, rSd) = PqKnn.codebooks(resid, numCodewords = 16, m = 8)
    val residErr = adcErrOf(PqKnn.ivfPqResidualJoinWith(cQueries, cCorpus, k = n,
      cents, resid, nprobe = 2, rFlat, rK, rSd, m = 8))
    assert(residErr * 10 < globalErr,
      s"residual ADC error $residErr not clearly below global-codebook $globalErr")
    assert(residErr < 0.5, s"residual ADC error $residErr too large in absolute terms")
  }

  test("k-means-trained codebooks beat the sampled init and are deterministic") {
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(flat: Array[Float], kEff: Int, subDim: Int): Double = {
      val pq = PqKnn.knnJoinWith(queries, corpus, k = 40, flat, kEff, subDim, m = 8)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect pq).size.toDouble / exact.size
    }
    val (sampled, k0, sd0) = PqKnn.codebooks(corpus, numCodewords = 16, m = 8)
    val (trained, k1, sd1) = PqKnn.trainCodebooks(corpus, numCodewords = 16, m = 8)
    assert(k1 == k0 && sd1 == sd0)
    assert(!trained.sameElements(sampled), "training should move the codebook")
    val rS = recallOf(sampled, k0, sd0)
    val rT = recallOf(trained, k1, sd1)
    assert(rT >= rS, s"trained pool-40 recall $rT < sampled $rS")
    // deterministic training: a second run reproduces the identical floats
    val (trained2, _, _) = PqKnn.trainCodebooks(corpus, numCodewords = 16, m = 8)
    assert(trained2.sameElements(trained), "training must be deterministic")
  }

  test("trained RESIDUAL codebooks: pool recall >= sampled through the full IVF-PQ residual pipeline (v45)") {
    import graft.operators.IvfKnn
    val cents = IvfKnn.centroids(corpus, 8)
    val resid = PqKnn.residuals(corpus, cents)
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hitsOf(flat: Array[Float], kEff: Int, subDim: Int): Int = {
      val pool = PqKnn.ivfPqResidualJoinWith(queries, corpus, k = 40,
        cents, resid, nprobe = 3, flat, kEff, subDim, m = 8)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect pool).size
    }
    val (sampled, k0, sd0) = PqKnn.codebooks(resid, numCodewords = 16, m = 8)
    val (trained, k1, sd1) = PqKnn.trainCodebooks(resid, numCodewords = 16, m = 8)
    assert(k1 == k0 && sd1 == sd0)
    assert(!trained.sameElements(sampled), "training should move the residual codebook")
    val hS = hitsOf(sampled, k0, sd0)
    val hT = hitsOf(trained, k1, sd1)
    assert(hT >= hS, s"trained residual pool-40 hits $hT < sampled $hS")
    assert(hS > 0, "sampled residual pool found nothing — fixture degenerate")
  }
}

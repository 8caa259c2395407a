package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DistanceMetric
import graft.index.{IndexParams, VectorIndex}
import graft.operators.RefineKnn

/** Gates for [[RefineKnn]] / [[VectorIndex.queryRefined]] — the
  * full-precision rerank of an SQ8 candidate pool (the
  * quantization-ceiling breaker):
  *  - closed form: a pool covering the whole corpus refined to top-k IS
  *    the exact float kNN, bit-for-bit (the v65 gate's contract);
  *  - ceiling-breaking: on a corpus engineered so 8-bit codes collapse
  *    near-ties (neighbors closer than a quantization step), the
  *    quantized index's own exact scan returns the WRONG top-k while
  *    the refined serve returns the float-exact one;
  *  - metric contract: a cosine index refines with cosine distance over
  *    RAW vectors (the semantic metric), not the index-internal one. */
class RefineKnnSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def floatTopK(corpus: Seq[(Long, Array[Float])],
      q: Array[Float], k: Int): Seq[Long] =
    corpus.map { case (id, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - q(i).toDouble; acc += d * d; i += 1 }
      (acc, id)
    }.sorted.take(k).map(_._2)

  test("pool covering the corpus refines to the exact float kNN") {
    val dim = 8
    val corpus = (0L until 500L).map { id =>
      val r = new scala.util.Random(id * 7919 + 3)
      (id, Array.fill(dim)(r.nextFloat()))
    }
    val corpusDf = corpus.toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
        quantized = true, quantLo = 0f, quantHi = 1f), numShards = 4)
    val queries = (0L until 5L).map { qid =>
      val r = new scala.util.Random(qid * 104729 + 11)
      (qid, Array.fill(dim)(r.nextFloat()))
    }
    val qdf = queries.toDF("query_id", "embedding")
    val got = idx.queryRefined(qdf, corpusDf, k = 10, pool = 500, searchWidth = 0)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = queries.flatMap { case (qid, q) =>
      floatTopK(corpus, q, 10).zipWithIndex.map { case (id, i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want, "full-pool refine must equal exact float kNN")
  }

  test("refine breaks the SQ8 near-tie ceiling the index's own exact scan hits") {
    val dim = 4
    // neighbors spaced ~1/8 of a quantization step apart around the query
    // point: SQ8 collapses several of them onto identical codes (ties
    // broken by id — NOT float order), so the quantized exact scan is
    // provably ceiling-limited on this corpus
    val step = 1.0f / 255f
    val q = Array.fill(dim)(0.5f)
    val near = (0 until 16).map { i =>
      (i.toLong, Array.fill(dim)(0.5f + step * (15 - i) / 8f / dim))
    }
    val far = (16L until 200L).map { id =>
      val r = new scala.util.Random(id * 6151 + 17)
      (id, Array.fill(dim)(r.nextFloat()))
    }
    val corpus = near ++ far
    val corpusDf = corpus.toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
        quantized = true, quantLo = 0f, quantHi = 1f), numShards = 2)
    val qdf = Seq((0L, q)).toDF("query_id", "embedding")
    val want = floatTopK(corpus, q, 5)
    val sq8Scan = idx.query(qdf, k = 5, searchWidth = 0)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(sq8Scan !== want,
      "premise: the SQ8 exact scan must mis-order the engineered near-ties " +
        s"(got $sq8Scan == float $want — tighten the spacing)")
    val refined = idx.queryRefined(qdf, corpusDf, k = 5, pool = 30,
        searchWidth = 0)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(refined === want,
      "a 30-candidate refine pool must recover the float-exact top-5")
  }

  test("cosine index refines with the semantic metric over raw vectors") {
    val dim = 6
    val corpus = (0L until 300L).map { id =>
      val r = new scala.util.Random(id * 31337 + 5)
      // unnormalized: cosine and L2 rank differently, so a wrong refine
      // metric would be caught
      (id, Array.fill(dim)(r.nextFloat() * (1f + (id % 7))))
    }
    val corpusDf = corpus.toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
        normalizeForCosine = true), numShards = 2)
    val queries = (0L until 3L).map { qid =>
      val r = new scala.util.Random(qid * 7 + 77)
      (qid, Array.fill(dim)(r.nextFloat()))
    }
    val qdf = queries.toDF("query_id", "embedding")
    val got = idx.queryRefined(qdf, corpusDf, k = 8, pool = 300, searchWidth = 0)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = queries.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) => (cos(qv, v), id) }.sorted.take(8)
        .zipWithIndex.map { case ((_, id), i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want, "refine must rank by cosine over RAW vectors")
  }

  test("beam-pool refine (the served face): refined hits >= raw beam hits at every width, exhaustive-pool beam == float exact") {
    val dim = 8
    val corpus = (0L until 600L).map { id =>
      val r = new scala.util.Random(id * 7919 + 23)
      (id, Array.fill(dim)(r.nextFloat()))
    }
    val corpusDf = corpus.toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 4, relaxedMonotonicity = 16, step = 4,
        quantized = true, quantLo = 0f, quantHi = 1f), numShards = 4)
    val queries = (0L until 8L).map { qid =>
      val r = new scala.util.Random(qid * 104729 + 19)
      (qid, Array.fill(dim)(r.nextFloat()))
    }
    val qdf = queries.toDF("query_id", "embedding")
    val gt: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
      qid -> floatTopK(corpus, q, 10).toSet
    }.toMap
    def hitsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .count { case (qid, nid) => gt(qid).contains(nid) }
    for (sw <- Seq(2, 4, 8)) {
      val beamHits = hitsOf(idx.query(qdf, k = 10, searchWidth = sw))
      val refinedHits = hitsOf(
        idx.queryRefined(qdf, corpusDf, k = 10, pool = 40, searchWidth = sw))
      assert(refinedHits >= beamHits,
        s"sw=$sw: refine ($refinedHits) must not lose to the raw beam " +
          s"($beamHits) — the rerank only reorders a superset pool")
    }
    // a beam pool covering the whole corpus refined to top-k IS the
    // float-exact kNN — the sw>0 counterpart of the closed-form gate
    val got = idx.queryRefined(qdf, corpusDf, k = 10, pool = 600,
        searchWidth = 600)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = queries.flatMap { case (qid, q) =>
      floatTopK(corpus, q, 10).zipWithIndex.map { case (id, i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want, "exhaustive beam pool must refine to float-exact")
  }

  test("requireCoverage refuses a stale base; default documents the silent drop") {
    val corpusDf = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(2f, 0f))).toDF("id", "embedding")
    val qdf = Seq((0L, Array(0.4f, 0f))).toDF("query_id", "embedding")
    val pool = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("query_id", "neighbor_id")
    // base is missing id 3 — a mispointed/stale store
    val stale = corpusDf.filter($"id" =!= 3L)
    val e = intercept[IllegalArgumentException] {
      RefineKnn.refine(pool, qdf, stale, k = 3, DistanceMetric.Euclidean2,
        requireCoverage = true).collect()
    }
    assert(e.getMessage.contains("covers only 2 of 3"),
      s"coverage error must name the gap: ${e.getMessage}")
    // without the flag the drop is silent (the documented contract for
    // by-construction-complete bases): 2 rows, not 3
    val silent = RefineKnn.refine(pool, qdf, stale, k = 3,
      DistanceMetric.Euclidean2)
    assert(silent.count() === 2)
  }

  test("pool below k is rejected; bare RefineKnn ranks a hand-built pool") {
    val corpusDf = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(2f, 0f))).toDF("id", "embedding")
    val idx = VectorIndex.build(corpusDf,
      IndexParams(minimumConnect = 2, relaxedMonotonicity = 8, step = 4),
      numShards = 1)
    val qdf = Seq((0L, Array(0.4f, 0f))).toDF("query_id", "embedding")
    intercept[IllegalArgumentException] {
      idx.queryRefined(qdf, corpusDf, k = 3, pool = 2, searchWidth = 0)
    }
    // the bare operator over an explicit pool: only pool members rank
    val pool = Seq((0L, 2L), (0L, 3L)).toDF("query_id", "neighbor_id")
    val got = RefineKnn.refine(pool, qdf, corpusDf, k = 2,
        DistanceMetric.Euclidean2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(2L, 3L), "id 1 is closest but outside the pool")
  }
}

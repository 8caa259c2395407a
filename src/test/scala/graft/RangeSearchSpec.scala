package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeSearch

class RangeSearchSpec extends AnyFunSuite with SparkSuite {

  // clustered synthetic corpus: 4 well-separated blobs so IVF cells are
  // meaningful and pruning has something to prune
  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val center = (i % 4) * 10.0f
      (i.toLong, Array.fill(dim)(center + r.nextFloat()))
    }.toDF("id", "embedding")
  }

  private def queriesDf(k: Int, dim: Int) = {
    import spark.implicits._
    (0 until k).map { i =>
      val r = new scala.util.Random(1000 + i)
      val center = (i % 4) * 10.0f
      (i.toLong, Array.fill(dim)(center + r.nextFloat()))
    }.toDF("query_id", "embedding")
  }

  test("pruned equals brute force across radii, and pruning engages") {
    val c = corpus(400, 8).cache()
    val q = queriesDf(6, 8).cache()
    for (r2 <- Seq(0.5, 2.0, 8.0, 1000.0)) {
      val brute = RangeSearch.rangeJoin(q, c, r2)
        .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pruned = RangeSearch.rangeJoinPruned(q, c, r2, numCentroids = 8)
        .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pruned === brute, s"r2=$r2")
    }
    // pruning must ENGAGE: on the 4-blob corpus with a tight radius,
    // the admitted (query, cell) grid is a strict subset of the full
    // |Q| x cells grid (cross-blob cells fail the triangle bound)
    val cents = graft.operators.IvfKnn.centroids(c, 8)
    val assigned = graft.operators.IvfKnn.assign(c, cents)
    val radii = RangeSearch.cellRadii(assigned, cents)
    val nCells = radii.count()
    val admitted = RangeSearch.admittedCells(q, cents, radii, 2.0).count()
    assert(admitted < 6 * nCells,
      s"no pruning: admitted=$admitted of ${6 * nCells} (cells=$nCells)")
    assert(admitted > 0)
    c.unpersist(); q.unpersist()
  }

  test("trained centroids prune strictly more (query, cell) pairs than stride cells") {
    import graft.operators.{IvfKnn, RangeSearch}
    val c = corpus(400, 8).cache()
    val q = queriesDf(6, 8).cache()
    val r2 = 2.0
    val stride = IvfKnn.centroids(c, 8)
    val trained = IvfKnn.trainedCentroids(c, 8, iterations = 5, numPartitions = 4)
    def admitted(cents: org.apache.spark.sql.DataFrame): Long = {
      val radii = RangeSearch.cellRadii(IvfKnn.assign(c, cents), cents)
      RangeSearch.admittedCells(q, cents, radii, r2).count()
    }
    val (aS, aT) = (admitted(stride), admitted(trained))
    assert(aT < aS, s"trained cells admitted $aT pairs, stride admitted $aS — " +
      "Lloyd must tighten the triangle bound on clustered data")
    // exactness is preserved under the trained quantizer too
    val brute = RangeSearch.rangeJoin(q, c, r2)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prunedT = RangeSearch.rangeJoinPrunedWith(q, c, r2, trained)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prunedT === brute)
    c.unpersist(); q.unpersist()
  }

  test("trained centroids cut quantization error and keep IVF routing recall") {
    import graft.operators.{ExactKnn, IvfKnn}
    val c = corpus(400, 8).cache()
    val q = queriesDf(6, 8).cache()
    // Lloyd's objective — mean squared distance to the assigned
    // centroid — must come out strictly below the stride sample's on
    // clustered data (each iteration is non-increasing by construction;
    // on this corpus the stride init is pathological: ids 0,50,...,350
    // all fall in blobs 0 and 2, so training has real work to do)
    def sse(cents: org.apache.spark.sql.DataFrame): Double =
      IvfKnn.assign(c, cents)
        .join(broadcast(cents), col("cell") === col("centroid_id"))
        .agg(sum(graft.functions.VectorFunctions
          .squaredL2(col("embedding"), col("c_embedding")))).head.getDouble(0)
    val stride = IvfKnn.centroids(c, 8)
    val trained = IvfKnn.trainedCentroids(c, 8, iterations = 5, numPartitions = 4)
    val (sS, sT) = (sse(stride), sse(trained))
    assert(sT < sS * 0.5,
      f"trained SSE $sT%.1f not well below stride SSE $sS%.1f")
    // and the trained quantizer routes well in absolute terms
    val exact = ExactKnn.knnJoin(q, c, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfKnn.knnJoinWith(q, c, k = 10, trained, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (exact intersect got).size
    assert(hits >= (exact.size * 9) / 10,
      s"trained nprobe=2 recall $hits/${exact.size} below 0.9 on 4 separated blobs")
    c.unpersist(); q.unpersist()
  }

  test("radius 0 keeps exact duplicates only") {
    import spark.implicits._
    val c = Seq(
      (0L, Array(1f, 1f)), (1L, Array(1f, 1f)), (2L, Array(2f, 1f))
    ).toDF("id", "embedding")
    val q = Seq((7L, Array(1f, 1f))).toDF("query_id", "embedding")
    val got = RangeSearch.rangeJoinPruned(q, c, 0.0, numCentroids = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L))
  }

  test("empty result when nothing is in range") {
    import spark.implicits._
    val c = Seq((0L, Array(100f, 100f))).toDF("id", "embedding")
    val q = Seq((1L, Array(0f, 0f))).toDF("query_id", "embedding")
    assert(RangeSearch.rangeJoinPruned(q, c, 1.0, numCentroids = 1).count() === 0)
    assert(RangeSearch.rangeJoin(q, c, 1.0).count() === 0)
  }

  test("boundary rows at exactly r2 are kept by both faces") {
    import spark.implicits._
    // d((0,0),(3,4)) squared = 25 exactly in float/double
    val c = Seq((0L, Array(3f, 4f)), (1L, Array(30f, 40f))).toDF("id", "embedding")
    val q = Seq((1L, Array(0f, 0f))).toDF("query_id", "embedding")
    val brute = RangeSearch.rangeJoin(q, c, 25.0).select("id").collect().map(_.getLong(0)).toSet
    val pruned = RangeSearch.rangeJoinPruned(q, c, 25.0, numCentroids = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(brute === Set(0L))
    assert(pruned === Set(0L))
  }

  test("negative radius is rejected") {
    import spark.implicits._
    val c = Seq((0L, Array(1f))).toDF("id", "embedding")
    val q = Seq((1L, Array(1f))).toDF("query_id", "embedding")
    assertThrows[IllegalArgumentException] {
      RangeSearch.rangeJoinPruned(q, c, -1.0, numCentroids = 1)
    }
  }
}

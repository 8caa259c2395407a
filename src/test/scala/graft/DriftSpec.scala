package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class DriftSpec extends AnyFunSuite with SparkSuite {

  test("identical distributions score ~zero PSI, planted shift scores high") {
    import spark.implicits._
    // ref and cur drawn from the same deterministic sequence -> PSI ~ 0
    val same = (0 until 2000).map(i => (i % 100 * 1.0, i % 2 == 0))
      .toDF("v", "cur")
    val psiSame = Drift.psiTotal(
      Drift.numericDrift(same, "v", col("cur"), lo = 0, hi = 100, bins = 10))
    assert(math.abs(psiSame) < 0.001, s"psiSame=$psiSame")

    // cur shifted wholesale into the upper half -> large PSI
    val shifted = ((0 until 1000).map(i => (i % 50 * 1.0, false)) ++
      (0 until 1000).map(i => (50.0 + i % 50, true))).toDF("v", "cur")
    val psiShift = Drift.psiTotal(
      Drift.numericDrift(shifted, "v", col("cur"), lo = 0, hi = 100, bins = 10))
    // complete separation: standard PSI practice calls > 0.25 "major drift"
    assert(psiShift > 1.0, s"psiShift=$psiShift")
  }

  test("hand-computed two-bucket PSI term") {
    import spark.implicits._
    // ref: 3 in bucket 0, 1 in bucket 1; cur: 1 in bucket 0, 3 in bucket 1
    val df = Seq(
      (0.0, false), (0.0, false), (0.0, false), (1.0, false),
      (0.0, true), (1.0, true), (1.0, true), (1.0, true)
    ).toDF("v", "cur")
    val rows = Drift.numericDrift(df, "v", col("cur"), lo = 0, hi = 2, bins = 2)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val (r0, c0) = (rows(0).getLong(1), rows(0).getLong(2))
    assert((r0, c0) === (3L, 1L))
    // smoothed shares with k=2 observed buckets, totals 4/4:
    // pRef0 = 4/6, pCur0 = 2/6 -> term = (2/6 - 4/6) * ln((2/6)/(4/6))
    val expected0 = (2.0 / 6 - 4.0 / 6) * math.log((2.0 / 6) / (4.0 / 6))
    assert(math.abs(rows(0).getDouble(3) - expected0) < 1e-6)
    // symmetric construction -> symmetric terms
    assert(math.abs(rows(1).getDouble(3) - expected0) < 1e-6)
  }

  test("one-sided bucket gets a finite smoothed term (no ln(0))") {
    import spark.implicits._
    val df = Seq((0.0, false), (1.0, true)).toDF("v", "cur")
    val rows = Drift.numericDrift(df, "v", col("cur"), lo = 0, hi = 2, bins = 2)
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(!r.isNullAt(3))
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
  }

  test("categorical drift counts and null exclusion") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), false), (Some("a"), false), (Some("b"), false),
      (Some("a"), true), (Some("b"), true), (None, true)
    ).toDF("c", "cur")
    val rows = Drift.categoricalDrift(df, "c", col("cur")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 2L, 1L), ("b", 1L, 1L)))
  }

  test("outliers clamp to edge buckets") {
    import spark.implicits._
    val df = Seq((-100.0, false), (1e9, true)).toDF("v", "cur")
    val rows = Drift.numericDrift(df, "v", col("cur"), lo = 0, hi = 10, bins = 5)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 4L))
  }

  test("multiDrift (one scan) equals the per-feature faces") {
    import spark.implicits._
    val df = (0 until 300).map { i =>
      (i * 1.7 % 50, if (i % 3 == 0) "x" else "y", i % 2 == 0)
    }.toDF("v", "c", "cur")
    val multi = Drift.multiDrift(df,
      numeric = Seq(Drift.NumericFeature("v", 0, 50, 5)),
      categorical = Seq("c"), isCurrent = col("cur"))
    val num = Drift.numericDrift(df, "v", col("cur"), 0, 50, 5)
      .select(lit("v").as("feature"),
        concat(lit("bin_"), lpad(col("bucket").cast("string"), 2, "0")).as("bucket"),
        col("n_ref"), col("n_cur"), col("psi_term"))
    val cat = Drift.categoricalDrift(df, "c", col("cur"))
      .select(lit("c").as("feature"), col("bucket"),
        col("n_ref"), col("n_cur"), col("psi_term"))
    val want = num.unionByName(cat)
    assert(multi.exceptAll(want).count() === 0)
    assert(want.exceptAll(multi).count() === 0)
  }

  test("null numeric values are excluded, never counted into bin 0") {
    import spark.implicits._
    // Spark's greatest/least SKIP nulls, so a non-null-preserving bucket
    // expression would map null -> bin 0; regression-pin the fix both on
    // the single-feature face and the multiDrift melt
    val df = Seq(
      (Some(0.5), false), (Some(0.5), false), (None, false),
      (Some(0.5), true), (None, true), (None, true)
    ).toDF("v", "cur")
    val rows = Drift.numericDrift(df, "v", col("cur"), lo = 0, hi = 2, bins = 2)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 1L))) // the three null rows appear nowhere
    val multi = Drift.multiDrift(df,
      numeric = Seq(Drift.NumericFeature("v", 0, 2, 2)), categorical = Nil,
      isCurrent = col("cur")).collect()
    assert(multi.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq(("bin_00", 2L, 1L)))
  }

  test("embedding drift: identical snapshots score ~0, a shifted blob lights up") {
    import spark.implicits._
    // 2 blobs in 4d; reference holds both, "same" current mirrors them,
    // "shifted" current abandons blob 1 entirely
    def blob(ids: Range, center: Float) = ids.map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.fill(4)(center + r.nextFloat()), false)
    }
    val ref = blob(0 until 100, 0f) ++ blob(100 until 200, 10f)
    val same = (ref.take(50) ++ ref.drop(100).take(50))
      .map { case (id, v, _) => (id + 1000L, v, true) }
    val shifted = blob(0 until 100, 0f).map { case (id, v, _) => (id + 2000L, v, true) }
    def psi(cur: Seq[(Long, Array[Float], Boolean)]): Double = {
      val df = (ref ++ cur).toDF("vec_id", "embedding", "cur")
      Drift.psiTotal(Drift.embeddingDrift(
        df, "vec_id", "embedding", col("cur"), numCells = 4))
    }
    val (psiSame, psiShifted) = (psi(same), psi(shifted))
    assert(psiSame < 0.05, s"identical distributions scored PSI $psiSame")
    assert(psiShifted > 0.5, s"abandoned blob scored only PSI $psiShifted")
    // trained centroids plug into the same monitor
    val df = (ref ++ shifted).toDF("vec_id", "embedding", "cur")
    val trained = graft.operators.IvfKnn.trainedCentroids(
      df.filter(!col("cur")).select(col("vec_id").as("id"), col("embedding")),
      numCentroids = 4, iterations = 3, numPartitions = 4)
    val psiTrained = Drift.psiTotal(Drift.embeddingDrift(
      df, "vec_id", "embedding", col("cur"), numCells = 4, cents = trained))
    assert(psiTrained > 0.5, s"trained-cell monitor scored only PSI $psiTrained")
  }

  test("invalid grid is rejected") {
    import spark.implicits._
    val df = Seq((1.0, true)).toDF("v", "cur")
    assertThrows[IllegalArgumentException] {
      Drift.numericDrift(df, "v", col("cur"), lo = 5, hi = 5, bins = 10)
    }
    assertThrows[IllegalArgumentException] {
      Drift.numericDrift(df, "v", col("cur"), lo = 0, hi = 10, bins = 0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HistogramBuffer, HistogramSketch}

/** Fixed-grid histogram sketch (operators/HistogramSketch.scala):
  * deterministic binning, lossless order-insensitive merge, partitioning
  * invariance, SQL registration, and quantile read-off. */
class HistogramSketchSpec extends AnyFunSuite with SparkSuite {

  test("binning clamps below/above range and is exact inside") {
    val b = new HistogramBuffer(0, 100, 10)
    Seq(-5L, 0L, 9L, 10L, 55L, 99L, 100L, 1000L).foreach(b.add)
    assert(b.counts(0) === 3) // -5 (clamped), 0, 9
    assert(b.counts(1) === 1) // 10
    assert(b.counts(5) === 1) // 55
    assert(b.counts(9) === 3) // 99, 100 (clamped), 1000 (clamped)
    assert(b.counts.sum === 8)
  }

  test("wide-but-legal ranges bin correctly (no Long overflow) and wrapped widths are rejected") {
    // (v - lo) * bins would overflow Long here; the exact wide-product
    // fallback must land each value in its true bin, never a negative index
    val b = new HistogramBuffer(0, Long.MaxValue, 1024)
    b.add(0L)
    b.add(Long.MaxValue - 1) // last bin
    b.add(Long.MaxValue / 2) // middle bin
    assert(b.counts(0) === 1)
    assert(b.counts(1023) === 1)
    assert(b.counts(511) === 1)
    assert(b.counts.sum === 3)
    // negative lo with the same wide fallback
    val c = new HistogramBuffer(-1000, Long.MaxValue - 1000, 4)
    c.add(Long.MaxValue - 1001)
    assert(c.counts(3) === 1)
    // hi > lo but hi - lo wraps past Long.MaxValue: rejected, not mis-binned
    assertThrows[IllegalArgumentException] {
      new HistogramBuffer(Long.MinValue, Long.MaxValue, 16)
    }
    assertThrows[IllegalArgumentException] {
      new HistogramBuffer(-2, Long.MaxValue, 16)
    }
  }

  test("merge is lossless vector addition (property)") {
    val gen = Gen.listOf(Gen.chooseNum(-50L, 150L))
    val prop = Prop.forAll(gen, gen) { (a, b) =>
      val whole = new HistogramBuffer(0, 100, 16)
      (a ++ b).foreach(whole.add)
      val l = new HistogramBuffer(0, 100, 16)
      a.foreach(l.add)
      val r = new HistogramBuffer(0, 100, 16)
      b.foreach(r.add)
      l.merge(r)
      java.util.Arrays.equals(whole.counts, l.counts)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("mismatched shapes refuse to merge") {
    val a = new HistogramBuffer(0, 100, 16)
    val b = new HistogramBuffer(0, 100, 8)
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("different shape"))
  }

  test("aggregate is partitioning-invariant and equals the local buffer") {
    import spark.implicits._
    val items = (1 to 5000).map(i => (i * 37L) % 700 - 100)
    val local = new HistogramBuffer(0, 512, 64)
    items.foreach(local.add)
    for (parts <- Seq(1, 4, 13)) {
      val got = items.toDF("v").repartition(parts)
        .agg(HistogramSketch.sketch(col("v"), 0L, 512L, 64)).head
        .getSeq[Long](0).toArray
      assert(java.util.Arrays.equals(got, local.counts), s"parts=$parts")
    }
  }

  test("SQL registration works and rejects misuse at analysis") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftSqlBridge.registerFunction(
      spark, "histogram_sketch", HistogramSketch.sqlBuilder)
    Seq(1L, 2L, 3L, 300L).toDF("v").createOrReplaceTempView("hs_vals")
    val counts = spark.sql(
      "SELECT histogram_sketch(v, 0, 512, 64) FROM hs_vals")
      .head.getSeq[Long](0)
    assert(counts(0) === 3 && counts(37) === 1 && counts.sum === 4)
    val e1 = intercept[Exception](
      spark.sql("SELECT histogram_sketch(v, 0, 512) FROM hs_vals").collect())
    assert(e1.getMessage.contains("expects 4 arguments"))
    val e2 = intercept[Exception](
      spark.sql("SELECT histogram_sketch(v, 0, 512, v) FROM hs_vals").collect())
    assert(e2.getMessage.contains("must be a literal"))
    val e3 = intercept[Exception](
      spark.sql("SELECT histogram_sketch(v, 512, 0, 64) FROM hs_vals").collect())
    assert(e3.getMessage.contains("range must be non-empty"))
  }

  test("serialization round trip preserves counts") {
    val agg = graft.operators.HistogramSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 0, 100, 10)
    val b = new HistogramBuffer(0, 100, 10)
    Seq(3L, 55L, 99L, -1L).foreach(b.add)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.lo === 0 && back.hi === 100 && back.bins === 10)
    assert(java.util.Arrays.equals(back.counts, b.counts))
  }

  test("quantile read-off: p50/p90 land within one bin width of exact") {
    import spark.implicits._
    val vals = (1 to 10000).map(i => ((i * 2654435761L) % 512).toLong)
    val sk = vals.toDF("v")
      .agg(HistogramSketch.sketch(col("v"), 0L, 512L, 64).as("counts"),
        count(lit(1)).as("n"))
      .select(posexplode(col("counts")).as(Seq("bin", "c")), col("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val est = sk.withColumn("cum", sum(col("c")).over(w))
      .agg(
        min(when(col("cum") >= expr("(n + 1) DIV 2"), (col("bin") + 1) * 8)).as("p50"),
        min(when(col("cum") >= expr("(n * 9 + 9) DIV 10"), (col("bin") + 1) * 8)).as("p90"))
      .head
    val sorted = vals.sorted
    val exact50 = sorted((vals.size + 1) / 2 - 1)
    val exact90 = sorted((vals.size * 9 + 9) / 10 - 1)
    assert(math.abs(est.getInt(0) - exact50) <= 8, s"p50 est ${est.getInt(0)} vs $exact50")
    assert(math.abs(est.getInt(1) - exact90) <= 8, s"p90 est ${est.getInt(1)} vs $exact90")
  }
}

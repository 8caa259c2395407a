package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class LayoutSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("zkey interleaves bits exactly (x at even positions, y at odd)") {
    // x=10=1010b, y=6=0110b -> z = x1<<2 | y1<<3 | y2<<5 | x3<<6 = 108
    val r = Seq((10L, 6L)).toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y"), bits = 4)).as[Long].head()
    assert(r === 108L)
    // masking: bits above `bits` are ignored
    val m = Seq((10L + 16L, 6L + 32L)).toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y"), bits = 4)).as[Long].head()
    assert(m === 108L)
  }

  test("streamZorderIngest lands every batch file sorted by the clustering key") {
    val rows = spark.range(512).select(col("id").as("o_orderkey"),
      (col("id") * 7 % 256).as("xb"), (col("id") * 13 % 256).as("yb"))
    val sink = graft.streaming.StreamingOps.streamZorderIngest(
      spark, rows, "xb", "yb", bits = 8)
    assert(sink.count() === 512)
    val files = sink.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f).select("zkey").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"file $f not zkey-sorted")
    }
  }

  test("z-order layout bounds BOTH dimensions' per-file spans; linear sort only the leading one") {
    // pseudo-uniform independent 8-bit dims over 8k rows
    val df = spark.range(8192)
      .select(col("id"),
        (col("id") * 7919 % 256).as("x"),
        (col("id") * 104729 % 256).as("y"))
    def spans(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val agg = laid.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (agg.getDouble(0), agg.getDouble(1))
    }
    val (zx, zy) = spans(ZOrder.clusterBy2d(df, "x", "y", bits = 8, numPartitions = 16))
    val (lx, ly) = spans(
      df.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    // linear: leading dim narrow, trailing dim spans ~the full range
    assert(lx < 40, s"linear leading-dim span should be narrow, got $lx")
    assert(ly > 200, s"linear trailing-dim span should be ~full-range, got $ly")
    // z-order: BOTH dims bounded (a 16-way split of the 16-bit z-space is
    // ~4 prefix bits -> ~64x64 quadrants; range boundaries may straddle two)
    assert(zx < 150, s"z-order x span should be bounded, got $zx")
    assert(zy < 150, s"z-order y span should be bounded, got $zy")
    assert(zy < ly / 2, s"z-order must at least halve the trailing-dim span: $zy vs $ly")
  }
}

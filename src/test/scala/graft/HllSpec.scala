package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Hll, HllBuffer}

/** HyperLogLog sketch (operators/Hll.scala): accuracy envelope, lossless
  * register-max merge, serialization round trip, SQL registration, and
  * determinism across partitionings. */
class HllSpec extends AnyFunSuite with SparkSuite {

  private def sketchOf(items: Iterable[String], p: Int): HllBuffer = {
    val b = new HllBuffer(p)
    items.foreach(s => b.add(Hll.hashUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))))
    b
  }

  test("estimate within 5 sigma across cardinality decades") {
    val p = 12
    val sigma = 1.04 / math.sqrt(1 << p)
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val est = sketchOf((1 to n).map(i => s"item_$i"), p).estimate
      val rel = math.abs(est - n).toDouble / n
      assert(rel <= 5 * sigma, s"n=$n est=$est rel=$rel > 5 sigma")
    }
  }

  test("merge is lossless: sketch(A ++ B) == sketch(A) merge sketch(B) (property)") {
    val gen = Gen.listOf(Gen.chooseNum(0, 5000).map(i => s"k$i"))
    val prop = Prop.forAll(gen, gen) { (a, b) =>
      val whole = sketchOf(a ++ b, 10)
      val left = sketchOf(a, 10)
      left.merge(sketchOf(b, 10))
      java.util.Arrays.equals(whole.registers, left.registers)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("aggregate is partitioning-invariant and matches the local sketch") {
    import spark.implicits._
    val items = (1 to 20000).map(i => s"val_${i % 7919}")
    val expected = sketchOf(items, 12).estimate
    for (parts <- Seq(1, 4, 13)) {
      val est = items.toDF("x").repartition(parts)
        .agg(Hll.approxDistinct(col("x"), 12)).head.getLong(0)
      assert(est === expected, s"parts=$parts")
    }
    assert(math.abs(expected - 7919).toDouble / 7919 < 0.08)
  }

  test("streaming sketch equals the batch sketch regardless of micro-batching") {
    import spark.implicits._
    // write a small documents-shaped parquet; the file-stream source
    // replays it in micro-batches and complete-mode state must converge
    // to the identical registers (register maxes are batch-insensitive)
    val dir = java.nio.file.Files.createTempDirectory("hll_stream_test_")
    val docs = (1 to 300).map(i =>
      (i.toLong, s"tok${i % 37} tok${i % 11} shared", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val pq = dir.resolve("docs.parquet").toString
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    // the parquet "file" path written by Spark is a directory; point the
    // stream at a real file inside it, as the production path does
    val part = new java.io.File(pq).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val streamed = graft.streaming.StreamingOps
      .streamApproxDistinct(spark, part, p = 12, statePartitions = 2)
      .select("source", "est").as[(String, Long)].collect().toMap
    val batch = spark.read.parquet(part)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").agg(Hll.approxDistinct(col("tok"), 12).as("est"))
      .as[(String, Long)].collect().toMap
    assert(streamed === batch)
    assert(streamed.keySet === Set("src0", "src1", "src2"))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("SQL registration: graft_approx_distinct works and rejects misuse at analysis") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftSqlBridge.registerFunction(
      spark, "graft_approx_distinct", Hll.sqlBuilder)
    (1 to 1000).map(i => i % 321).toDF("x").createOrReplaceTempView("hll_in")
    val est = spark.sql("SELECT graft_approx_distinct(x, 12) FROM hll_in").head.getLong(0)
    assert(math.abs(est - 321).toDouble / 321 < 0.08, s"est=$est")
    val e1 = intercept[Exception](spark.sql("SELECT graft_approx_distinct(x) FROM hll_in"))
    assert(e1.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception](spark.sql("SELECT graft_approx_distinct(x, x) FROM hll_in"))
    assert(e2.getMessage.contains("literal"))
    val e3 = intercept[Exception](spark.sql("SELECT graft_approx_distinct(x, 99) FROM hll_in"))
    assert(e3.getMessage.contains("[4, 18]"))
  }

  test("serialization round trip preserves the registers") {
    val agg = graft.operators.HllAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), p = 8)
    val buf = sketchOf((1 to 5000).map(_.toString), 8)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.p === 8)
    assert(java.util.Arrays.equals(back.registers, buf.registers))
  }

  test("linear-counting regime: tiny cardinalities are near-exact") {
    // with m=4096 registers and n<=100, linear counting is exact up to
    // register collisions (expected ~n^2/2m ≈ 1.2 at n=100 — the fixed
    // fixture measures exactly one at n=100)
    for (n <- Seq(0, 1, 5, 50, 100)) {
      val est = sketchOf((1 to n).map(i => s"u$i"), 12).estimate
      assert(math.abs(est - n) <= 2, s"n=$n est=$est")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sq8Functions

/** Scalar quantization (SQ8) codec: storage size, reconstruction error
  * bound, ranking fidelity vs exact float distances, and the SQL surface. */
class Sq8Spec extends AnyFunSuite with SparkSuite {

  private val lo = -0.5
  private val hi = 0.5

  private def emb = Tables.embeddings(spark, sfDir)

  test("sq8 packs one byte per dimension (4x smaller than float32)") {
    val r = emb.select(
      length(Sq8Functions.sq8(col("embedding"), lo, hi)).as("nbytes"),
      size(col("embedding")).as("dim")).distinct().collect()
    assert(r.length == 1)
    assert(r(0).getInt(0) == r(0).getInt(1)) // bytes == dims (float32 is 4x)
  }

  test("decode(encode(v)) reconstructs within half a quantization step per dim") {
    val step = (hi - lo) / 255.0
    val maxErr = emb.select(
      aggregate(
        zip_with(
          col("embedding"),
          Sq8Functions.sq8Decode(Sq8Functions.sq8(col("embedding"), lo, hi), lo, hi),
          (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => greatest(acc, v)).as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    assert(maxErr <= step / 2 + 1e-12, s"max reconstruction error $maxErr > ${step / 2}")
  }

  test("quantized ranking agrees with exact float ranking (recall@10 >= 0.9)") {
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Queries.v21Sq8Knn(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 vs exact = $recall")
  }

  test("two-stage rerank (v22) recalls at least as well as raw quantized ranking (v21)") {
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val rQuant = recallOf(Queries.v21Sq8Knn(spark, sfDir))
    val rRerank = recallOf(Queries.v22Sq8Rerank(spark, sfDir))
    assert(rRerank >= rQuant,
      s"rerank recall $rRerank < quantized-only recall $rQuant")
    assert(rRerank >= 0.95, s"two-stage recall@10 = $rRerank")
  }

  test("quantized distance is the exact integer the definition gives") {
    // spot-check interpreted vs codegen'd paths against a Scala reference
    val rows = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"),
        Sq8Functions.sq8(col("embedding"), lo, hi).as("q"))
      .collect()
    val scale = 255.0 / (hi - lo)
    def quantRef(v: Seq[Float]): Array[Int] =
      v.map(x => math.max(0.0, math.min(255.0,
        math.floor((x.toDouble - lo) * scale + 0.5))).toInt).toArray
    for (r <- rows) {
      val v = r.getSeq[Float](1)
      val q = r.getAs[Array[Byte]](2).map(_ & 0xff)
      assert(q.sameElements(quantRef(v)), s"vec ${r.getLong(0)} quantization mismatch")
    }
    val a = rows(0).getAs[Array[Byte]](2).map(_ & 0xff)
    val b = rows(1).getAs[Array[Byte]](2).map(_ & 0xff)
    val expected = a.zip(b).map { case (x, y) => ((x - y) * (x - y)).toLong }.sum
    val got = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), Sq8Functions.sq8(col("embedding"), lo, hi).as("q"))
      .withColumnRenamed("vec_id", "ida").withColumnRenamed("q", "qa")
      .crossJoin(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("idb"), Sq8Functions.sq8(col("embedding"), lo, hi).as("qb")))
      .filter(col("ida") === 0 && col("idb") === 1)
      .select(Sq8Functions.sq8L2Sq(col("qa"), col("qb"))).collect()(0).getLong(0)
    assert(got == expected, s"sq8 distance $got != reference $expected")
  }

  test("SQL surface: vec_sq8 / vec_sq8_l2sq / vec_sq8_decode registered") {
    graft.functions.GraftFunctions.register(spark)
    emb.createOrReplaceTempView("sq8_emb")
    val n = spark.sql(
      """SELECT vec_sq8_l2sq(vec_sq8(a.embedding, -0.5D, 0.5D),
        |                    vec_sq8(b.embedding, -0.5D, 0.5D)) AS d,
        |       vec_sq8_decode(vec_sq8(a.embedding, -0.5D, 0.5D), -0.5D, 0.5D) AS back
        |FROM sq8_emb a JOIN sq8_emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5""".stripMargin).collect()
    assert(n.length == 5 && n.forall(r => r.getLong(0) >= 0L))
  }

  test("vec_sq8_l2sq raises on mismatched quantized lengths") {
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2, 3), Array[Byte](1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Sq8Functions.sq8L2Sq(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(t => Option(t.getMessage).exists(_.contains("mismatched"))))
  }

  test("vec_sq8 rejects constant hi <= lo at analysis time") {
    val e = intercept[Exception] {
      emb.select(Sq8Functions.sq8(col("embedding"), 0.5, 0.5)).collect()
    }
    assert(e.getMessage.contains("hi > lo"), e.getMessage)
  }

  test("SIMD byte kernel matches scalar past the 32k-dim int-sum boundary") {
    // worst-case bytes (0 vs 255): total distance 40000 * 255^2 ~ 2.6e9
    // exceeds Int.MaxValue — guards the widen-before-cross-lane-sum fix
    val dim = 40000
    assume(graft.index.SubIndexGraph.simdAvailable && dim <= graft.index.SubIndexGraph.sqL2U8MaxDim)
    val a = Array.fill[Byte](dim)(0)
    val flat = Array.fill[Byte](dim)(-1) // 0xff = 255 unsigned
    val simd = graft.index.SimdKernels.sqL2U8(a, flat, 0)
    var scalar = 0L
    var i = 0
    while (i < dim) {
      val d = (a(i) & 0xff) - (flat(i) & 0xff); scalar += (d * d).toLong; i += 1
    }
    assert(simd == scalar, s"simd $simd != scalar $scalar")
    assert(simd == dim.toLong * 255L * 255L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BinaryQuantFunctions

/** Binary (1-bit) quantization: packing layout, Hamming distance against
  * a Scala reference, SQL surface, error handling, and candidate-pool
  * usefulness vs exact search. */
class BinaryQuantSpec extends AnyFunSuite with SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("vec_bits packs one SIGN bit per dimension, MSB-first (32x under float32)") {
    val rows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        BinaryQuantFunctions.bits(col("embedding")).as("b"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Float](1)
      val b = r.getAs[Array[Byte]](2)
      assert(b.length == (v.length + 7) / 8, s"vec ${r.getLong(0)} packed length")
      for (i <- v.indices) {
        val bit = (b(i >>> 3) >> (7 - (i & 7))) & 1
        assert(bit == (if (v(i) > 0f) 1 else 0), s"vec ${r.getLong(0)} bit $i")
      }
      // pad bits in the last byte stay zero (they must cancel in the XOR)
      for (i <- v.length until b.length * 8) {
        assert(((b(i >>> 3) >> (7 - (i & 7))) & 1) == 0, s"pad bit $i set")
      }
    }
  }

  test("vec_hamming equals the sign-disagreement count (Scala reference)") {
    val rows = emb.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("ida"), BinaryQuantFunctions.bits(col("embedding")).as("ba"))
      .crossJoin(emb.filter(col("vec_id") < 6)
        .select(col("vec_id").as("idb"), BinaryQuantFunctions.bits(col("embedding")).as("bb")))
      .select(col("ida"), col("idb"),
        BinaryQuantFunctions.hamming(col("ba"), col("bb")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (((a, b), d) <- got) {
      val expect = rows(a).zip(rows(b)).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(d == expect, s"hamming($a, $b) = $d, want $expect")
    }
    // self-distance is zero
    assert((0L until 6L).forall(i => got((i, i)) == 0))
  }

  test("FWHT butterfly equals the naive popcount(i & j) Hadamard fold bit-for-bit") {
    // the O(d log d) butterfly must reproduce the closed-form O(d^2)
    // definition exactly — every output is a signed sum of float32
    // inputs, exact in double, so order cannot change a bit
    val rows = emb.filter(col("vec_id") < 8)
      .select(col("embedding"), BinaryQuantFunctions.hadamard(col("embedding")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getSeq[Float](0).toArray
      val got = r.getSeq[Double](1).toArray
      val d = v.length
      assert((d & (d - 1)) == 0, s"fixture dim $d not a power of 2")
      for (j <- 0 until d) {
        var acc = 0.0
        for (i <- 0 until d) {
          val x = v(i).toDouble
          acc += (if ((Integer.bitCount(i & j) & 1) == 0) x else -x)
        }
        assert(got(j) == acc, s"output $j: fwht ${got(j)} != naive $acc")
      }
    }
  }

  test("wide-exponent rows fall back to the sequential fold (still == naive)") {
    import spark.implicits._
    // [1e30f, 1f, -1e30f, 1f]-style rows violate the butterfly's
    // exactness bound (exponent spread + log2(d) > 28): the butterfly
    // would round differently than the sequential definition, so the
    // expression must detect the spread and replay the naive fold
    val hard = Seq(
      Seq(1e30f, 1f, -1e30f, 1f),
      Seq(Float.MaxValue, Float.MinPositiveValue, -1f, 2f),
      Seq(3.5e28f, -7f, 1e-20f, 0f))
    val df = hard.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .select(BinaryQuantFunctions.hadamard(col("embedding")).as("h"),
        col("embedding"))
    for (r <- df.collect()) {
      val v = r.getSeq[Float](1).toArray
      val got = r.getSeq[Double](0).toArray
      for (j <- v.indices) {
        var acc = 0.0
        for (i <- v.indices) {
          val x = v(i).toDouble
          acc += (if ((Integer.bitCount(i & j) & 1) == 0) x else -x)
        }
        assert(got(j) == acc, s"output $j: got ${got(j)} != sequential $acc")
      }
    }
    // non-finite elements also take the sequential path (NaN-propagation
    // order matches the definition rather than the butterfly's)
    val nan = Seq((0L, Seq(Float.NaN, 1f, 2f, 3f))).toDF("vec_id", "embedding")
      .select(BinaryQuantFunctions.hadamard(
        col("embedding").cast("array<float>")).as("h"))
    assert(nan.head.getSeq[Double](0).forall(_.isNaN))
  }

  test("SQL surface: vec_bits / vec_hamming registered") {
    graft.functions.GraftFunctions.register(spark)
    emb.createOrReplaceTempView("bin_emb")
    val n = spark.sql(
      """SELECT vec_hamming(vec_bits(a.embedding), vec_bits(b.embedding)) AS d
        |FROM bin_emb a JOIN bin_emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5""".stripMargin).collect()
    assert(n.length == 5 && n.forall(r => r.getInt(0) >= 0))
  }

  test("vec_hamming raises on mismatched packed lengths") {
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2, 3), Array[Byte](1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(BinaryQuantFunctions.hamming(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(t => Option(t.getMessage).exists(_.contains("mismatched"))))
  }

  test("binary pool is a useful candidate generator: recall well above chance") {
    val exact = Queries.v4KnnExact(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpusSize = emb.filter(col("vec_id") >= 10).count().toDouble
    def recallOf(pool: Int): Double = {
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), BinaryQuantFunctions.bits(col("embedding")).as("qb"))
      val c = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), BinaryQuantFunctions.bits(col("embedding")).as("cb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("d"), col("neighbor_id"))
      val got = c.crossJoin(broadcast(q))
        .select(col("query_id"), col("neighbor_id"),
          BinaryQuantFunctions.hamming(col("qb"), col("cb")).as("d"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= pool)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val pool40 = recallOf(40)
    assert(pool40 > 40.0 / corpusSize * 3,
      s"pool-40 recall $pool40 no better than chance")

    // the composed two-stage query (v32) converts pool recall into
    // top-10 recall: exact rerank reorders a SUPERSET of the binary
    // top-10, so it can only surface more of the true neighbors
    val top10 = recallOf(10)
    val rerank = Queries.v32BinaryRerank(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerankRecall = (exact intersect rerank).size.toDouble / exact.size
    assert(rerankRecall >= top10,
      s"rerank recall $rerankRecall fell below the raw binary top-10's $top10")
  }

  test("Hadamard projection rescues sign codes on a correlated corpus") {
    // every dimension shares one dominant component s = +-2 per row:
    // raw sign bits all equal sign(s) -> exactly TWO distinct codes in
    // the whole corpus. The Hadamard rows j > 0 have balanced +-1
    // entries, so s cancels exactly and those 63 bits discriminate the
    // informative noise directions.
    import spark.implicits._
    val dim = 64
    def noise(id: Long, i: Int): Float =
      ((((id * 2654435761L + i * 40503L) >>> 7) % 201L) - 100L) / 1000.0f // +-0.1
    def shared(id: Long): Float = if (((id * 1103515245L + 12345L) >>> 16) % 2 == 0) 2f else -2f
    val rows = (0L until 2000L).map { id =>
      (id, Array.tabulate(dim)(i => shared(id) + noise(id, i)).toSeq)
    }
    val cCorpus = rows.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
      .filter(col("id") >= 10)
    val cQueries = rows.take(10).map { case (id, v) => (id, v.map(_ + 0.003f)) }
      .toDF("query_id", "embedding")
      .select(col("query_id"), col("embedding").cast("array<float>").as("embedding"))
    val rawDistinct = cCorpus
      .select(BinaryQuantFunctions.bits(col("embedding")).as("b")).distinct().count()
    assert(rawDistinct <= 2, s"expected raw codes to collapse to 2, got $rawDistinct")
    def projBits(c: org.apache.spark.sql.Column) =
      BinaryQuantFunctions.bits(BinaryQuantFunctions.hadamard(c))
    val projDistinct = cCorpus.select(projBits(col("embedding")).as("b")).distinct().count()
    assert(projDistinct > 100, s"projected codes should spread, got $projDistinct distinct")
    // recall vs exact search: projected pool-40 well above chance AND
    // above the collapsed raw codes at the same budget
    val exact = graft.operators.ExactKnn.knnJoin(cQueries, cCorpus, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d"), col("neighbor_id"))
    def poolRecall(mk: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
      val got = cCorpus.select(col("id").as("neighbor_id"), mk(col("embedding")).as("cb"))
        .crossJoin(broadcast(cQueries.select(col("query_id"), mk(col("embedding")).as("qb"))))
        .select(col("query_id"), col("neighbor_id"),
          BinaryQuantFunctions.hamming(col("qb"), col("cb")).as("d"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 40)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val rawRecall = poolRecall(BinaryQuantFunctions.bits)
    val projRecall = poolRecall(projBits)
    val chance = 40.0 / cCorpus.count()
    assert(projRecall > chance * 3, s"projected recall $projRecall no better than chance")
    assert(projRecall > rawRecall,
      s"projected recall $projRecall should beat collapsed raw codes' $rawRecall")
  }

  test("mean centering rescues sign codes on a biased corpus (raw codes collapse)") {
    import org.apache.spark.sql.DataFrame
    // shift every embedding by +5: the corpus is now all-positive
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => (x + lit(5.0f)).cast("float")).as("embedding"))
    val sCorpus = shifted.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val sQueries = shifted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // raw sign bits collapse to ONE shared code — Hamming is useless
    val rawDistinct = sCorpus
      .select(BinaryQuantFunctions.bits(col("embedding")).as("b")).distinct().count()
    assert(rawDistinct == 1, s"expected a single collapsed code, got $rawDistinct")
    // centered bits (the v34 path) keep discriminating: recall vs exact
    // search on the SAME shifted corpus is well above chance
    val means = sCorpus
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(round(avg(col("v").cast("double")), 6).as("m"))
      .orderBy(col("pos")).collect().map(_.getDouble(1)).toSeq
    val mLit = typedLit(means)
    def centeredBits(c: org.apache.spark.sql.Column) =
      BinaryQuantFunctions.bits(zip_with(c, mLit, (x, m) => x.cast("double") - m))
    val exactS = graft.operators.ExactKnn.knnJoin(sQueries, sCorpus, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d"), col("neighbor_id"))
    val centeredTop = sCorpus
      .select(col("id").as("neighbor_id"), centeredBits(col("embedding")).as("cb"))
      .crossJoin(broadcast(sQueries.select(col("query_id"), centeredBits(col("embedding")).as("qb"))))
      .select(col("query_id"), col("neighbor_id"),
        BinaryQuantFunctions.hamming(col("qb"), col("cb")).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 40)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactS intersect centeredTop).size.toDouble / exactS.size
    val corpusSize = sCorpus.count().toDouble
    assert(recall > 40.0 / corpusSize * 3,
      s"centered pool-40 recall $recall no better than chance on the biased corpus")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

class DistanceSpec extends AnyFunSuite with SparkSuite {

  private def pairs = {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.filter(col("vec_id") < 100).select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
      .select((col("vec_id") - 100).as("vec_id"), col("embedding").as("eb"))
    a.join(b, Seq("vec_id"))
  }

  test("codegen squared-L2 is bit-equal to the zip_with/aggregate fold") {
    val diff = pairs.select(
      VectorFunctions.squaredL2(col("ea"), col("eb")).as("fast"),
      VectorFunctions.squaredL2Fold(col("ea"), col("eb")).as("fold"))
      .filter(col("fast") =!= col("fold")).count()
    assert(diff === 0)
  }

  test("codegen inner-product and cosine distances are bit-equal to fold forms") {
    val diff = pairs.select(
      VectorFunctions.innerProductDistance(col("ea"), col("eb")).as("ipf"),
      VectorFunctions.innerProductDistanceFold(col("ea"), col("eb")).as("ipd"),
      VectorFunctions.cosineDistance(col("ea"), col("eb")).as("cof"),
      VectorFunctions.cosineDistanceFold(col("ea"), col("eb")).as("cod"))
      .filter(col("ipf") =!= col("ipd") || col("cof") =!= col("cod")).count()
    assert(diff === 0)
  }

  test("squared-L2 matches a hand-computed oracle on literals") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.5f, 0.0f, -1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.squaredL2(col("a"), col("b"))).head.getDouble(0)
    val want = 0.25 + 4.0 + 16.0
    assert(math.abs(got - want) < 1e-12)
  }

  test("distance metric properties: self-distance") {
    import spark.implicits._
    val v = Array(0.6f, 0.8f, 0.0f) // unit norm
    val df = Seq((v, v)).toDF("a", "b")
    val r = df.select(
      VectorFunctions.squaredL2(col("a"), col("b")),
      VectorFunctions.cosineDistance(col("a"), col("b"))).head
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("SQL registration: vec_l2sq usable from spark.sql") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql_test")
    val n = spark.sql(
      """SELECT a.vec_id, vec_l2sq(a.embedding, b.embedding) AS d
        |FROM emb_sql_test a JOIN emb_sql_test b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 10""".stripMargin)
      .filter(col("d") > 0).count()
    assert(n === 10)
  }

  test("mismatched vector lengths raise instead of truncating") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    for (fn <- Seq(
        VectorFunctions.squaredL2 _,
        VectorFunctions.innerProductDistance _,
        VectorFunctions.cosineDistance _)) {
      val e = intercept[Exception] {
        df.select(fn(col("a"), col("b"))).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(t => Option(t.getMessage).exists(_.contains("mismatched"))),
        s"expected a mismatched-length error, got: ${e.getMessage}")
    }
  }

  test("null input yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.squaredL2(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExactKnn, LshKnn, RecallEval}

class LshKnnSpec extends AnyFunSuite with SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding"))
  private lazy val corpus = emb.filter(col("vec_id") >= 20)
    .select(col("vec_id").as("id"), col("embedding"))

  test("bucket signature is deterministic and bounded") {
    val b = emb.select(LshKnn.bucket(col("embedding"), 8).as("b"))
    val mm = b.agg(min(col("b")), max(col("b"))).head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 256)
    // deterministic: recomputation yields identical buckets
    val b2 = emb.select(LshKnn.bucket(col("embedding"), 8).as("b"))
    assert(b.exceptAll(b2).count() === 0)
  }

  test("bucketed kNN returns at most k ranked same-bucket neighbors") {
    val res = LshKnn.knnJoin(queries, corpus, k = 5, numPlanes = 4).cache()
    val counts = res.groupBy("query_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
    // every result's distance must be >= the exact nearest's distance
    val exact1 = ExactKnn.knnJoin(queries, corpus, k = 1)
      .select(col("query_id"), col("distance").as("best"))
    val bad = res.filter(col("rank") === 1).join(exact1, "query_id")
      .filter(col("distance") < col("best")).count()
    assert(bad === 0)
    res.unpersist()
  }

  test("fewer planes -> bigger buckets -> recall not worse") {
    def hitRate(planes: Int): Double = {
      val res = LshKnn.knnJoin(queries, corpus, k = 5, numPlanes = planes)
      val exact = ExactKnn.knnJoin(queries, corpus, k = 5)
      res.select("query_id", "neighbor_id")
        .intersect(exact.select("query_id", "neighbor_id")).count().toDouble /
        exact.count()
    }
    val coarse = hitRate(2)
    val fine = hitRate(10)
    assert(coarse >= fine - 0.05, s"coarse=$coarse fine=$fine")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactKnn

class ExactKnnSpec extends AnyFunSuite with SparkSuite {

  private def emb = Tables.embeddings(spark, sfDir)

  test("knnJoin returns exactly k ranked neighbors per query, distances ascending") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding"))
    val res = ExactKnn.knnJoin(queries, corpus, k = 7).cache()

    val perQuery = res.groupBy("query_id").count().collect()
    assert(perQuery.length === 5)
    assert(perQuery.forall(_.getLong(1) === 7))

    // rank order == ascending distance within each query
    val bad = res.withColumn("prev",
      lag(col("distance"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("prev") > col("distance")).count()
    assert(bad === 0)
    res.unpersist()
  }

  test("rank 1 neighbor is the true argmin (brute force cross-check)") {
    val queries = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") =!= 3)
      .select(col("vec_id").as("id"), col("embedding"))
    val top = ExactKnn.knnJoin(queries, corpus, k = 1).head
    // brute-force via the fold-form distance, min over all rows
    val want = corpus.crossJoin(queries.select(col("embedding").as("qe")))
      .select(col("id"),
        graft.functions.VectorFunctions.squaredL2Fold(col("qe"), col("embedding")).as("d"))
      .orderBy(col("d"), col("id")).head
    assert(top.getAs[Long]("neighbor_id") === want.getLong(0))
    assert(top.getAs[Double]("distance") === want.getDouble(1))
  }
}

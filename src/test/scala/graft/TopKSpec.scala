package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExactKnn, TopK, TopKBuffer}

class TopKSpec extends AnyFunSuite with SparkSuite {

  test("TopKBuffer keeps the k smallest with deterministic tie-breaks") {
    val buf = new TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (1.0, 1L), (4.0, 4L), (0.5, 9L))
      .foreach { case (d, id) => buf.insert(d, id) }
    assert(buf.sortedPairs.toSeq === Seq((0.5, 9L), (1.0, 1L), (1.0, 2L)))
  }

  test("TopKBuffer merge equals inserting everything into one buffer") {
    val all = (1 to 100).map(i => ((i * 37 % 19).toDouble, i.toLong))
    val (lhs, rhs) = all.splitAt(50)
    val a = new TopKBuffer(10); lhs.foreach { case (d, id) => a.insert(d, id) }
    val b = new TopKBuffer(10); rhs.foreach { case (d, id) => b.insert(d, id) }
    a.merge(b)
    val one = new TopKBuffer(10); all.foreach { case (d, id) => one.insert(d, id) }
    assert(a.sortedPairs.toSeq === one.sortedPairs.toSeq)
  }

  test("knnAggregate matches knnJoin exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("id"), col("embedding"))
    val viaAgg = TopK.knnAggregate(queries, corpus, k = 12)
    val viaWin = ExactKnn.knnJoin(queries, corpus, k = 12)
    assert(viaAgg.exceptAll(viaWin).count() === 0)
    assert(viaWin.exceptAll(viaAgg).count() === 0)
  }

  test("knnFused (custom LogicalPlan/Strategy/Exec) matches knnJoin exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("id"), col("embedding"))
    val fused = graft.plans.KnnJoinPlan.knnFused(queries, corpus, k = 12)
    val viaWin = ExactKnn.knnJoin(queries, corpus, k = 12)
    assert(fused.exceptAll(viaWin).count() === 0)
    assert(viaWin.exceptAll(fused).count() === 0)
  }

  test("group smaller than k returns all members, no crash") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") > 0 && col("vec_id") < 5)
      .select(col("vec_id").as("id"), col("embedding"))
    assert(TopK.knnAggregate(queries, corpus, k = 10).count() === 4)
  }
}

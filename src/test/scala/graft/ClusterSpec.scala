package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class ClusterSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("duplicateClusters: chains collapse to min id, singletons keep their own") {
    val docs = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // chain 1-2-3, pair 5-6, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val labels = Dedup.duplicateClusters(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("duplicateClusters converges on a long path (diameter > 1 iteration)") {
    val n = 12L
    val docs = (1L to n).map(i => (i, "x")).toDF("doc_id", "text")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.duplicateClusters(docs, pairs).as[(Long, Long)].collect()
    assert(labels.forall(_._2 === 1L))
  }
}

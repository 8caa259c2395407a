package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridRetrieval

class HybridRetrievalSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("lexicalTopN ranks by shared distinct token count with id tie-break") {
    val q = Seq((100L, "alpha beta gamma")).toDF("query_id", "text")
    val c = Seq(
      (1L, "alpha beta gamma delta"), // 3 shared
      (2L, "alpha beta unrelated"),   // 2 shared
      (3L, "beta beta beta"),         // 1 shared (distinct tokens)
      (4L, "nothing here"))           // 0 shared -> absent
      .toDF("doc_id", "text")
    val r = HybridRetrieval.lexicalTopN(q, c, n = 10)
      .orderBy("lex_rank")
      .select("doc_id", "n_shared", "lex_rank")
      .as[(Long, Long, Int)].collect().toList
    assert(r === List((1L, 3L, 1), (2L, 2L, 2), (3L, 1L, 3)))
  }

  test("lexicalTopN ignores empty tokens and respects n") {
    val q = Seq((1L, "a  b")).toDF("query_id", "text") // double space -> empty token
    val c = Seq((10L, "a b"), (11L, "a"), (12L, "b")).toDF("doc_id", "text")
    val r = HybridRetrieval.lexicalTopN(q, c, n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(r === Set(10L, 11L)) // rank 3 (doc 12) cut by n=2
  }

  test("rrfFuse sums reciprocal ranks and reports 0 for a missing leg") {
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "dense_rank")
    val lex = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "lex_rank")
    val r = HybridRetrieval.rrfFuse(dense, lex, k = 10)
      .orderBy("rank")
      .select("doc_id", "rrf", "dense_rank", "lex_rank")
      .as[(Long, Double, Int, Int)].collect().toList
    // doc 11: 1/62 + 1/61 = highest; doc 10: 1/61 dense only; doc 12: 1/62 lex only
    assert(r.map(_._1) === List(11L, 10L, 12L))
    assert(r(0)._2 === math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6)
    assert(r(1) === ((10L, math.rint(1.0 / 61 * 1e6) / 1e6, 1, 0)))
    assert(r(2) === ((12L, math.rint(1.0 / 62 * 1e6) / 1e6, 0, 2)))
  }

  test("rrfFuse equal-score ties break by doc_id and k truncates") {
    // two docs with identical single-leg rank-1 scores in different queries
    val dense = Seq((1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3))
      .toDF("query_id", "doc_id", "dense_rank")
    val lex = Seq((1L, 21L, 1), (1L, 20L, 2), (1L, 23L, 3))
      .toDF("query_id", "doc_id", "lex_rank")
    val top2 = HybridRetrieval.rrfFuse(dense, lex, k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toList
    // 20 and 21 both score 1/61 + 1/62; tie -> lower doc_id first
    assert(top2 === List(20L, 21L))
  }
}

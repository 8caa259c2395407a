package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the properties the scale design relies
  * on (PLANS.md / SCALE.md): broadcast of dimension tables, the rank
  * window compiling to WindowGroupLimit (partial top-k before the
  * shuffle), and parquet filter pushdown reaching the scan. These fail
  * loudly if a Spark upgrade or config change silently degrades a plan. */
class PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q2 joins its dimension tables by broadcast, not sort-merge") {
    val p = plan("q2_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("v4 exact kNN bounds the shuffle with WindowGroupLimit") {
    val p = plan("v4_knn_exact")
    assert(p.contains("WindowGroupLimit"))
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed filters in:\n${p.take(2000)}")
  }

  test("v5 top-k aggregate runs partial-then-final (ObjectHashAggregate)") {
    val p = plan("v5_knn_topk")
    assert(p.contains("partial_topk_by_distance"))
    assert(p.contains("ObjectHashAggregate"))
  }
}

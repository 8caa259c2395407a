package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSuite {

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.crossJoin(intervals)
      .where(col("p") >= col("lo") && col("p") <= col("hi"))

  test("binned join equals the naive BETWEEN join, pairs met exactly once") {
    import spark.implicits._
    val points = (0L to 400L).map(i => (i, i * 7 % 1000)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 0L, 99L), (2L, 50L, 260L), (3L, 500L, 500L), (4L, 900L, 999L),
      (5L, 0L, 999L) // an interval spanning every bin
    ).toDF("iid", "lo", "hi")
    for (w <- Seq(10L, 100L, 1000L)) {
      val got = RangeJoin.binnedIntervalJoin(points, intervals, "p", "lo", "hi", w)
        .select("pid", "iid")
      val want = naive(points, intervals).select("pid", "iid")
      assert(got.exceptAll(want).count() === 0, s"binWidth=$w extra rows")
      assert(want.exceptAll(got).count() === 0, s"binWidth=$w missing rows")
      assert(got.count() === got.distinct().count(), s"binWidth=$w duplicates")
    }
  }

  test("negative coordinates bin correctly (floor, not truncate-toward-zero)") {
    import spark.implicits._
    val points = (-50L to 50L).map(i => (i, i)).toDF("pid", "p")
    val intervals = Seq((1L, -35L, -5L), (2L, -10L, 10L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, intervals, "p", "lo", "hi", 16L)
      .select("pid", "iid")
    val want = naive(points, intervals).select("pid", "iid")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("plan is a shuffled equi-join, not a nested-loop join") {
    import spark.implicits._
    val points = (0L to 100L).map(i => (i, i)).toDF("pid", "p")
    val intervals = Seq((1L, 10L, 30L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.binnedIntervalJoin(points, intervals, "p", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

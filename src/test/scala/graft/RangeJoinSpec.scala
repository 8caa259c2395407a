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

  test("overlap join equals naive overlap, pairs met exactly once") {
    import spark.implicits._
    // deterministic ragged intervals, including touching endpoints,
    // nested, bin-spanning, and negative coordinates
    val left = (0L until 60L).map { i =>
      val lo = i * 37 % 500 - 100; (i, lo, lo + i * 13 % 90)
    }.toDF("lid", "l_lo", "l_hi")
    val right = (0L until 60L).map { j =>
      val lo = j * 53 % 500 - 100; (j, lo, lo + j * 11 % 120)
    }.toDF("rid", "r_lo", "r_hi")
    val want = left.crossJoin(right)
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("lid", "rid")
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.binnedOverlapJoin(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", w).select("lid", "rid")
      assert(got.exceptAll(want).count() === 0, s"binWidth=$w extra rows")
      assert(want.exceptAll(got).count() === 0, s"binWidth=$w missing rows")
      assert(got.count() === got.distinct().count(), s"binWidth=$w duplicates")
    }
  }

  test("overlap join restricts to key groups and plans as an equi-join") {
    import spark.implicits._
    val left = Seq((1L, 10L, 0L, 10L), (2L, 10L, 20L, 30L), (3L, 20L, 0L, 10L))
      .toDF("lid", "k", "l_lo", "l_hi")
    val right = Seq((7L, 10L, 5L, 6L), (8L, 20L, 5L, 6L), (9L, 30L, 5L, 6L))
      .toDF("rid", "k", "r_lo", "r_hi")
    val df = RangeJoin.binnedOverlapJoin(left, right,
      "l_lo", "l_hi", "r_lo", "r_hi", 8L, keys = Seq("k"))
    // same-key overlapping pairs only: (1,7) and (3,8)
    assert(df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet === Set((1L, 7L), (3L, 8L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
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

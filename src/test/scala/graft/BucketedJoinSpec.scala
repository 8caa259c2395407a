package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedJoinSpec extends AnyFunSuite with SparkSuite {

  test("bucketed-by-key join runs with no Exchange on either join side") {
    val df = Queries.b1BucketedJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only Exchanges allowed are AFTER the join (the group-by and the
    // final ordering) — the join inputs read pre-bucketed files directly
    val joinIdx = plan.indexOf("SortMergeJoin")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs must not shuffle (bucket co-location):\n$belowJoin")
    assert(belowJoin.contains("SelectedBucketsCount") || belowJoin.contains("Bucketed: true"),
      s"scan must be bucketed:\n$belowJoin")
  }

  test("bucketed join result equals the plain shuffled join") {
    val bucketed = Queries.b1BucketedJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(bucketed.toSeq === plain.toSeq)
  }
}

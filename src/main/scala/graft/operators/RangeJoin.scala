package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval (range) join: pair every point with every interval that
  * contains it, WITHOUT the BroadcastNestedLoopJoin Spark plans for a bare
  * `p BETWEEN lo AND hi` condition (quadratic, and broadcast-bound — dead at
  * 100 TB).
  *
  * Shape: intervals explode into one row per `binWidth`-sized bin they
  * overlap; points map to exactly ONE bin; the join becomes a plain
  * shuffled equi-join on the bin id plus a residual containment filter.
  * Each qualifying (point, interval) pair meets exactly once (the point
  * lives in exactly one bin), so no dedup pass is needed.
  *
  * Scale: shuffle is hash-partitioned on bin id; interval replication is
  * bounded by ceil(width / binWidth) + 1 rows. Choose binWidth on the order
  * of the typical interval width — replication stays O(1) while bins stay
  * selective. Dense bins (heavy time ranges) spread across tasks via AQE
  * skew handling like any other equi-join key.
  */
object RangeJoin {

  /** Exact floor division for LONG columns: x div w after subtracting the
    * (always non-negative) pmod keeps it a pure LONG IntegralDivide —
    * correct for negative coordinates (unlike truncating `div` alone) and
    * for magnitudes past 2^53 (unlike a DOUBLE divide). */
  private def floorDiv(x: Column, w: Long): Column = {
    val r = pmod(x, lit(w))
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.GraftSqlBridge.expression(x - r),
        org.apache.spark.sql.graft.GraftSqlBridge.expression(lit(w))))
  }

  /** Join `points` (point column `pCol`, LONG) to `intervals` (LONG columns
    * `loCol`, `hiCol`, inclusive bounds) on containment. All other columns
    * of both inputs pass through. */
  def binnedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals.withColumn(
      "__bin",
      explode(sequence(floorDiv(col(loCol), binWidth).cast("long"),
        floorDiv(col(hiCol), binWidth).cast("long"))))
    val pt = points.withColumn("__bin", floorDiv(col(pCol), binWidth).cast("long"))
    pt.join(iv, Seq("__bin"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }
}

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

  /** Interval-OVERLAP join (both sides are intervals): pair every left
    * interval `[loL, hiL]` with every right interval `[loR, hiR]` that
    * overlaps it (`loL <= hiR AND loR <= hiL`, inclusive LONG bounds),
    * optionally restricted to equal values of `keys` — again WITHOUT the
    * BroadcastNestedLoopJoin a bare inequality conjunction plans as.
    *
    * Both sides explode into the `binWidth`-sized bins they touch and the
    * join becomes a shuffled equi-join on `(keys..., bin)` plus the
    * residual overlap filter. An overlapping pair shares EVERY bin in the
    * intersection of their bin ranges, so the pair is claimed exactly
    * once by keeping only the bin `max(bin(loL), bin(loR))` — the first
    * bin both touch — instead of a dedup shuffle.
    *
    * Scale: replication per row is ceil(width / binWidth) + 1; pick
    * binWidth on the order of the typical interval width. The shuffle is
    * a plain hash equi-join on (keys, bin) — AQE skew-splitting applies
    * to hot bins like any other key. */
  def binnedOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      loL: String,
      hiL: String,
      loR: String,
      hiR: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lv = left.withColumn(
      "__bin",
      explode(sequence(floorDiv(col(loL), binWidth).cast("long"),
        floorDiv(col(hiL), binWidth).cast("long"))))
    val rv = right.withColumn(
      "__bin",
      explode(sequence(floorDiv(col(loR), binWidth).cast("long"),
        floorDiv(col(hiR), binWidth).cast("long"))))
    lv.join(rv, keys :+ "__bin")
      .where(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .where(col("__bin") ===
        greatest(floorDiv(col(loL), binWidth), floorDiv(col(loR), binWidth)).cast("long"))
      .drop("__bin")
  }
}

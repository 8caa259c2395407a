package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row (key, ts) the LATEST right row
  * with the same key and right.ts <= left.ts. Spark has no native as-of
  * join; the scalable composition is the tagged-union trick:
  *
  *   1. union right rows (tagged 0, carrying the payload) with left rows
  *      (tagged 1, payload null);
  *   2. one window per key ordered by (ts, tag): running
  *      `last(payload, ignoreNulls)` — each probe row sees the most
  *      recent state row at or before its timestamp (state sorts before
  *      probes on ties, giving `>=` semantics);
  *   3. keep the probe rows.
  *
  * ONE shuffle on the key, no row explosion (a naive range join produces
  * |left| x |matching right| intermediates; this is |left| + |right|) —
  * the shape survives arbitrary scale and skew-bounded keys. Right rows
  * must be unique per (key, ts): pre-aggregate if they are not, or the
  * match on a tied timestamp is nondeterministic.
  */
object AsOfJoin {

  /** @param left     probe side; must have `keyCol`, `tsCol`
    * @param right    state side; must have `keyCol`, `tsCol`, `valueCol`
    *                 (unique per (key, ts))
    * @param asOfCol  output column holding the matched value (null when no
    *                 right row is at or before the probe's ts)
    * @return left rows + asOfCol */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      asOfCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val probes = left
      .withColumn("_tag", lit(1))
      .withColumn("_state", lit(null).cast(right.schema(valueCol).dataType))
    val states = right
      .select(col(keyCol), col(tsCol), col(valueCol))
      .withColumn("_tag", lit(0))
      .withColumnRenamed(valueCol, "_state")
    // align schemas: state rows carry nulls for the probe-only columns
    val stateAligned = leftCols.foldLeft(states) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("_tag") :+ col("_state")): _*)
    val probeAligned = probes.select((leftCols.map(col) :+ col("_tag") :+ col("_state")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stateAligned.union(probeAligned)
      .withColumn(asOfCol, last(col("_state"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_state")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * primitive: interleaving the bits of two bucketed dimensions gives a
  * single sort key under which rows close in EITHER dimension land close
  * in the file order, so parquet row-group min/max statistics stay
  * narrow on BOTH columns and a 2-D predicate skips most of a 100 TB
  * table (a linear sort keeps stats narrow on the leading column only —
  * the trailing dimension's min/max spans the full range in every file
  * and nothing prunes).
  *
  * The key is pure per-row bit arithmetic (shifts / masks composed from
  * codegen'd built-ins — no UDF), so computing it is a map-side pass;
  * the layout move is then `repartitionByRange(zkey)` +
  * `sortWithinPartitions(zkey)` at write time, one range shuffle that
  * replaces the sort a linear layout would need anyway. LayoutSpec
  * measures the claim: under a z-order range partitioning BOTH
  * dimensions' per-file spans are bounded; under a linear sort the
  * trailing dimension spans ~the full range in every file.
  */
object ZOrder {

  /** Morton-interleave two non-negative bucketed dimensions of `bits`
    * bits each into a 2*bits-bit key: x's bit i lands at position 2i,
    * y's at 2i+1. Values must already be bucketed into [0, 2^bits) —
    * the caller picks the bucketing (quantiles, hash, floor-div) that
    * fits the column; out-of-range bits are masked off. */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Cluster `df` for 2-D locality: range-partition + sort by the
    * Morton key of the two bucketed columns. This is the write-path
    * layout operator — the returned frame, written to parquet, yields
    * files whose min/max stats are narrow in BOTH dimensions. */
  def clusterBy2d(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("zkey", zkey(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }
}

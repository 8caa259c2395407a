package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the trainer-side step after chunking (t16): bin
  * variable-length token chunks into fixed token budgets so every
  * training row is near-full. Exact first-fit-decreasing is inherently
  * sequential; this is the HARMONIC-CLASS packing (Lee & Lee, JACM 1985
  * — the classic online bin-packing family): each chunk's capacity
  * class is `cap = max(floor(budget / n_tokens), 1)` and each bin takes
  * `cap` consecutive chunks in (n_tokens DESC, doc_id, start) order
  * within its class. Validity is closed-form — a class-`cap` chunk has
  * n_tokens ≤ budget/cap, so `cap` of them sum to ≤ budget; chunks
  * LARGER than the budget land in class 1, one per bin, flagged
  * `oversize` (the caller truncates or splits them).
  *
  * Scale shape: class assignment is pure map-side arithmetic; the only
  * exchange is the window partitioned by (class, group), where `group`
  * = doc_id mod numGroups spreads each class over numGroups independent
  * packing streams — bins never cross groups, packing stays valid, and
  * per-partition work is corpus/`(classes x groups)` instead of a
  * global sort. Waste is bounded: ≤ 1 partially-filled bin per (class,
  * group). Deterministic and fully SQL-replayable (the t22 oracle).
  */
object Packing {

  /** Pack chunk rows into budgeted bins; returns one row per bin:
    * (class, grp, bin, n_chunks, bin_tokens, oversize), totally
    * ordered. `chunks` needs (docCol, startCol, tokCol). */
  def packChunks(chunks: DataFrame, budget: Int, numGroups: Int,
      tokCol: String = "n_tokens", docCol: String = "doc_id",
      startCol: String = "start"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(numGroups > 0, s"numGroups must be positive: $numGroups")
    val cap: Column = greatest(
      floor(lit(budget).cast("double") / col(tokCol)), lit(1L)).cast("int")
    val w = Window.partitionBy(col("class"), col("grp"))
      .orderBy(col(tokCol).desc, col(docCol), col(startCol))
    chunks
      // an empty chunk carries no tokens to pack — and budget/0 would
      // overflow the class arithmetic into a garbage negative class
      .filter(col(tokCol) > 0)
      .withColumn("class", cap)
      .withColumn("grp", pmod(col(docCol), lit(numGroups)).cast("int"))
      .withColumn("rn", row_number().over(w))
      .withColumn("bin",
        floor((col("rn") - 1).cast("double") / col("class")).cast("int"))
      .groupBy(col("class"), col("grp"), col("bin"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col(tokCol)).cast("long").as("bin_tokens"),
        (max(col(tokCol)) > budget).as("oversize"))
      .orderBy(col("class"), col("grp"), col("bin"))
  }
}

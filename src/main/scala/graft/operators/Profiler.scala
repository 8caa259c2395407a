package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "what is in this table" primitive a
  * pipeline runs before touching 100 TB of new data: per column, null
  * count, distinct cardinality, and min/max, all computed in a SINGLE
  * aggregate scan and emitted in long (column, metric...) form.
  *
  * Scale shape: everything is one `df.agg(...)` — one scan, one
  * one-row result; the long-form explode touches k rows. Two distinct
  * counters can run side by side: the mergeable HLL sketch
  * ([[Hll.approxDistinct]], 4 KiB state, no distinct-value shuffle)
  * and the exact `count_distinct`. The exact form is the TEST-scale
  * cross-check — Spark plans k exact distincts via Expand (k+1 copies
  * of the projected row), which is the part you drop at 100 TB, where
  * `hll_ok` has already proven the sketch tracks the truth and the
  * sketch IS the answer (t12's argument, applied per column). Pass
  * `exact = false` to get that production shape: the Expand leg is
  * gone from the plan (PlanShapeSpec asserts it), `n_distinct` is the
  * HLL estimate, and `hll_ok` is omitted (there is no exact value to
  * compare against).
  *
  * min/max are cast to string so one output schema serves any column
  * mix; long and ASCII-string orderings agree across engines. Supported
  * column types for cross-engine hash gates are integer and string —
  * float/double render differently across engines (Spark "1.0E7" vs
  * DuckDB "10000000.0"), so format such columns explicitly (e.g.
  * `format_number`) before profiling if the output feeds an exact
  * comparison.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exact) Seq(count_distinct(col(c)).as(s"${c}__distinct")) else Nil
      distinctAgg ++ Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        Hll.approxDistinct(col(c).cast("string"), 12).as(s"${c}__est"),
        // aggregate in the NATIVE type (numeric columns order numerically
        // — "99" > "499" as strings), cast only the result for the
        // uniform output schema
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    one
      .select(explode(array(cols.map { c =>
        val base = Seq(
          lit(c).as("column"),
          col("n_rows"),
          col(s"${c}__nulls").as("n_nulls"))
        val distinctCols =
          if (exact) Seq(
            col(s"${c}__distinct").as("n_distinct"),
            (abs(col(s"${c}__est") - col(s"${c}__distinct"))
              <= col(s"${c}__distinct").cast("double") * 0.08).as("hll_ok"))
          else Seq(col(s"${c}__est").as("n_distinct"))
        struct(base ++ distinctCols ++ Seq(
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str")): _*)
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}

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
  * counters run side by side: the mergeable HLL sketch
  * ([[Hll.approxDistinct]], 4 KiB state, no distinct-value shuffle)
  * and the exact `count_distinct`. The exact form is the TEST-scale
  * cross-check — Spark plans k exact distincts via Expand (k+1 copies
  * of the projected row), which is the part you drop at 100 TB, where
  * `hll_ok` has already proven the sketch tracks the truth and the
  * sketch IS the answer (t12's argument, applied per column).
  * min/max are cast to string so one output schema serves any column
  * mix; long and ASCII-string orderings agree across engines.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        Hll.approxDistinct(col(c).cast("string"), 12).as(s"${c}__est"),
        // aggregate in the NATIVE type (numeric columns order numerically
        // — "99" > "499" as strings), cast only the result for the
        // uniform output schema
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    one
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        (abs(col(s"${c}__est") - col(s"${c}__distinct"))
          <= col(s"${c}__distinct").cast("double") * 0.08).as("hll_ok"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}

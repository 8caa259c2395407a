package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two data snapshots — the
  * monitoring pass a production pipeline runs when a new crawl/dump
  * lands: "does this batch look like the corpus we trained the filters
  * on?" Implements the Population Stability Index (PSI), the standard
  * per-feature drift score: for matched buckets with reference share
  * `p_ref` and current share `p_cur`,
  * `PSI = sum_b (p_cur - p_ref) * ln(p_cur / p_ref)`.
  *
  * Determinism contract (what makes the score gate-able cross-engine):
  *  - buckets are exact — fixed-grid integer bins for numerics
  *    ([[HistogramSketch]]'s clamped `floor((v - lo)/w)` rule), raw
  *    values for categoricals;
  *  - counts are exact integers from ONE conditional aggregate scan
  *    (`sum(when(side...))` — the two snapshots are never scanned
  *    separately);
  *  - shares are Laplace-smoothed `(c + 1) / (n + k)` with `k` = the
  *    number of OBSERVED buckets, so empty-on-one-side buckets score a
  *    finite term instead of ln(0), with no epsilon constant to tune;
  *  - the output is LONG FORM, one row per observed bucket with its
  *    rounded PSI term — per-bucket doubles are order-independent,
  *    unlike a float total whose summation order differs across
  *    engines. [[psiTotal]] folds the bounded bucket list in bucket
  *    order on the driver when the scalar is wanted.
  *
  * Scale shape: one full scan producing a `k`-row grouped result
  * (k = bins or category cardinality — bounded by construction for
  * bins, by the column's domain for categories); everything after the
  * groupBy touches k rows. The one-row bucket-count/total aggregate
  * broadcasts back. Nothing is per-row beyond the bin expression
  * (pure codegen arithmetic).
  */
object Drift {

  /** Numeric-column drift over a fixed [lo, hi) grid of `bins` equal
    * buckets (outliers clamp to the edge buckets — same rule as
    * [[HistogramSketch]]).
    * Output: (bucket LONG, n_ref, n_cur, psi_term) for every bucket
    * observed on either side, ordered by bucket. */
  def numericDrift(
      df: DataFrame, valueCol: String, isCurrent: Column,
      lo: Double, hi: Double, bins: Int): DataFrame =
    drift(df.filter(col(valueCol).isNotNull),
      numericBucket(valueCol, lo, hi, bins).as("bucket"), isCurrent)

  /** The fixed-grid bucket expression (shared with the streaming face —
    * [[graft.streaming.StreamingOps.streamDrift]] must bucket
    * identically for streaming == batch to hold). Null-preserving: a
    * null value maps to a NULL bucket, never a bin. The naive form
    * would not be — Spark's `greatest`/`least` SKIP null arguments, so
    * `least(bins-1, greatest(0, null))` silently returns bin 0,
    * counting every null row into the lowest bucket. */
  private[graft] def numericBucket(
      valueCol: String, lo: Double, hi: Double, bins: Int): Column = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo (got $bins, [$lo, $hi))")
    val width = (hi - lo) / bins
    when(col(valueCol).isNotNull,
      least(lit(bins - 1L),
        greatest(lit(0L), floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"))))
  }

  /** Categorical-column drift: buckets are the column's raw values.
    * Meant for bounded-cardinality columns (status/language/source
    * codes); a high-cardinality column belongs in [[numericDrift]]'s
    * grid or a top-k recode first.
    * Output: (bucket STRING, n_ref, n_cur, psi_term), ordered. */
  def categoricalDrift(df: DataFrame, catCol: String, isCurrent: Column): DataFrame =
    drift(df.filter(col(catCol).isNotNull),
      col(catCol).cast("string").as("bucket"), isCurrent)

  /** EMBEDDING-distribution drift — the vector face: scalar grids can't
    * bucket an `Array[Float]` column, but the pipeline's most
    * drift-sensitive signal IS the embedding (a new encoder checkpoint,
    * a domain shift in the crawl). Buckets are IVF cells: centroids are
    * stride-sampled from the REFERENCE side only ([[IvfKnn.centroids]]
    * — deterministic, so the whole monitor replays in closed-form SQL,
    * the v14 contract), both sides assign by the same codegen'd argmin
    * (per-row expression, corpus never shuffles), and the occupancy
    * counts feed the standard smoothed PSI terms. Per-cell occupancy is
    * exactly the quantization view of the embedding distribution — the
    * same signal IVF routing depends on, so a drifting PSI here also
    * predicts degrading ANN recall against a stale index snapshot.
    * Output: (bucket LONG = cell id, n_ref, n_cur, psi_term), ordered.
    *
    * For a TRAINED monitoring grid, pass [[IvfKnn.trainedCentroids]]
    * output via `cents` (sampled stays the oracle face — the v27/v36
    * split). */
  def embeddingDrift(
      df: DataFrame, idCol: String, embCol: String, isCurrent: Column,
      numCells: Int, cents: DataFrame = null): DataFrame = {
    val rows = df.filter(col(embCol).isNotNull)
    val centroids = Option(cents).getOrElse {
      IvfKnn.centroids(
        rows.filter(!isCurrent)
          .select(col(idCol).cast("long").as("id"), col(embCol).as("embedding")),
        numCells)
    }
    drift(rows, IvfKnn.cellExpr(centroids, col(embCol)).as("bucket"), isCurrent)
  }

  private def drift(df: DataFrame, bucket: Column, isCurrent: Column): DataFrame =
    psiTerms(df
      .select(bucket, isCurrent.cast("boolean").as("__cur"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(!col("__cur"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__cur"), 1L).otherwise(0L)).as("n_cur")))

  /** A numeric feature for [[multiDrift]]: profiled over the fixed
    * [lo, hi) grid of `bins` buckets. */
  case class NumericFeature(col: String, lo: Double, hi: Double, bins: Int)

  /** Multi-feature drift in ONE scan — the shape for a wide table: the
    * per-feature face costs one corpus pass per feature, so profiling a
    * 100-column table would rescan 100 TB a hundred times. Here every
    * row melts to its (feature, bucket) pairs via one generator
    * (numeric features keyed "bin_NN" so they can never collide with a
    * categorical value), one groupBy on the bounded (feature, bucket)
    * key space, and per-feature smoothed PSI terms. Output:
    * (feature, bucket STRING, n_ref, n_cur, psi_term), ordered. */
  def multiDrift(
      df: DataFrame, numeric: Seq[NumericFeature], categorical: Seq[String],
      isCurrent: Column): DataFrame = {
    require(numeric.nonEmpty || categorical.nonEmpty, "need at least one feature")
    val numEntries = numeric.map { f =>
      val width = math.max(2, (f.bins - 1).toString.length)
      struct(lit(f.col).as("feature"),
        concat(lit("bin_"),
          lpad(numericBucket(f.col, f.lo, f.hi, f.bins).cast("string"), width, "0"))
          .as("bucket"))
    }
    val catEntries = categorical.map { c =>
      struct(lit(c).as("feature"), col(c).cast("string").as("bucket"))
    }
    val melted = df
      .select(explode(array(numEntries ++ catEntries: _*)).as("fb"),
        isCurrent.cast("boolean").as("__cur"))
      .select(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"),
        col("__cur"))
      // null value -> null bucket -> excluded (numericBucket is
      // null-preserving, and concat/lpad propagate the null; categorical
      // buckets are the raw cast, null for null)
      .filter(col("bucket").isNotNull)
    psiTerms(melted
      .groupBy(col("feature"), col("bucket"))
      .agg(
        sum(when(!col("__cur"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__cur"), 1L).otherwise(0L)).as("n_cur")))
  }

  /** Smoothed-share PSI terms over a (bucket, n_ref, n_cur) bucket-count
    * table — the post-aggregation half, shared by the batch faces above
    * and the streaming face (whose counts come out of a complete-mode
    * streaming aggregation; conditional counts are additive, so the
    * streamed table is batch-identical and so are the terms). */
  private[graft] def psiTerms(counts: DataFrame): DataFrame = {
    // totals + observed-bucket count (per feature when the counts carry
    // a feature column): rows off the k-row grouped result, broadcast
    // back (never a second corpus scan)
    val perFeature = counts.columns.contains("feature")
    val pRef = (col("n_ref") + lit(1L)).cast("double") / (col("__tr") + col("__k"))
    val pCur = (col("n_cur") + lit(1L)).cast("double") / (col("__tc") + col("__k"))
    val aggs = Seq(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__k"))
    val joined =
      if (perFeature)
        counts.join(
          broadcast(counts.groupBy(col("feature")).agg(aggs.head, aggs.tail: _*)),
          Seq("feature"))
      else counts.crossJoin(broadcast(counts.agg(aggs.head, aggs.tail: _*)))
    val outCols = (if (perFeature) Seq(col("feature")) else Nil) ++ Seq(
      col("bucket"), col("n_ref"), col("n_cur"),
      round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
    joined.select(outCols: _*)
      .orderBy((if (perFeature) Seq(col("feature")) else Nil) :+ col("bucket"): _*)
  }

  /** Scalar PSI: fold the bounded long-form result in key order on the
    * driver (deterministic summation order). Ordering must cover EVERY
    * key column present — a [[multiDrift]] frame repeats bucket values
    * across features, so bucket-only ordering would leave the fold order
    * among equal buckets nondeterministic. */
  def psiTotal(driftDf: DataFrame): Double = {
    val keys = (if (driftDf.columns.contains("feature")) Seq(col("feature")) else Nil) :+
      col("bucket")
    driftDf.orderBy(keys: _*).select(col("psi_term"))
      .collect().foldLeft(0.0)((acc, r) => acc + r.getDouble(0))
  }
}

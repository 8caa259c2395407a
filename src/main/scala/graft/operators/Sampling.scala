package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling / splitting — the reproducible
  * train/test-split primitive of a training-data pipeline. A row's bucket
  * is a pure function of its id (first 28 bits of md5, uniform), so:
  *
  *  - the same id lands in the same split on every run, any engine, any
  *    partitioning (no RNG, no seed-ordering trap);
  *  - splits are disjoint and exhaustive by construction;
  *  - it is a plain per-row predicate: scales as a filtered scan with
  *    pushdown-friendly shape, no shuffle, no sample() nondeterminism.
  *
  * md5 rather than a native hash so any SQL engine reproduces the split
  * exactly (DuckDB: ('0x' || substr(md5(id::VARCHAR), 1, 7))::BIGINT).
  *
  * Contract: ids must be NON-NULL — a NULL id hashes to a NULL bucket,
  * which every filter here rejects, so such a row would appear in NO
  * split (violating exhaustiveness silently). Validate or assign ids
  * upstream.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id column. */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 7), 16, 10).cast("long") % buckets

  /** Keep rows whose bucket falls in [0, accept) of [0, buckets) — an
    * accept/buckets fraction sample, deterministic in the id. */
  def deterministicSample(df: DataFrame, idCol: String, buckets: Int, accept: Int): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < accept)

  /** Disjoint, exhaustive (train, test) split: test = `testBuckets` of
    * `buckets` hash buckets, train = the rest. */
  def trainTestSplit(
      df: DataFrame, idCol: String, buckets: Int, testBuckets: Int): (DataFrame, DataFrame) = {
    val b = hashBucket(col(idCol), buckets)
    (df.filter(b >= testBuckets), df.filter(b < testBuckets))
  }

  /** Weight-proportional deterministic sample (Efraimidis & Spirakis,
    * IPL 2006 top-k form): each row gets the deterministic uniform
    * u = (md5_28(id) + 1) / (2^28 + 1) in (0, 1) and the key
    * ln(u) / w — the k LARGEST keys are a weight-proportional
    * without-replacement sample. No RNG (reproducible on any engine /
    * partitioning / run), and top-k-by-key is the bounded partial/final
    * aggregation shape, so the whole sample is one scan + one k-bounded
    * exchange at any corpus size — the quality-weighted corpus-mixing
    * primitive. Keys round to 6 decimals before ranking (ulp-level ln
    * wobble below the grain; ties break by id). Weights must be > 0. */
  def weightedSampleKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string")), 1, 7), 16, 10).cast("double") + 1.0) /
      lit((1 << 28) + 1.0)
    round(log(u) / weight.cast("double"), 6)
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fail LOUDLY on a non-positive weight instead of corrupting the
    // sample silently: ln(u)/w flips sign for w < 0 (the bad row would
    // deterministically win rank 1) and -Inf for w = 0 (silently never
    // sampled). The guard is a per-row branch that never fires on legal
    // input, so the oracle (which replays only the key formula) is
    // unaffected.
    val w = when(col(weightCol) > lit(0), col(weightCol)).otherwise(
      raise_error(concat(lit(s"weightedSample: non-positive $weightCol for $idCol="),
        col(idCol).cast("string"))))
    // orderBy + limit plans as TakeOrderedAndProject (per-partition
    // partial top-k, never a global sort); the rank window then touches
    // only the k survivors — a global Window BEFORE the cut would drag
    // the whole corpus into one partition
    val top = df
      .withColumn("sample_key", weightedSampleKey(col(idCol), w))
      .orderBy(col("sample_key").desc, col(idCol)).limit(k)
    top.withColumn("sample_rank",
      row_number().over(Window.orderBy(col("sample_key").desc, col(idCol))).cast("int"))
  }

  /** Stratified deterministic sample: each stratum keeps its own
    * accept-count of the shared hash buckets — the training-mix move
    * (down-sample the over-represented stratum, keep more of the rare
    * ones). `rates` maps stratum value -> accepted buckets in
    * [0, buckets]; strata absent from the map keep `defaultAccept`.
    * Still a pure per-row predicate (the bounded rates map inlines as a
    * CASE chain — no join, no shuffle, no RNG), so the kept row set is
    * identical on any engine or partitioning, and per-stratum fractions
    * are exact multiples of 1/buckets by construction. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      buckets: Int, rates: Map[String, Int], defaultAccept: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    (rates.values.toSeq :+ defaultAccept).foreach(a =>
      require(a >= 0 && a <= buckets, s"accept $a outside [0, $buckets]"))
    val accept = rates.foldLeft(lit(defaultAccept)) { case (acc, (k, a)) =>
      when(col(stratumCol) === k, lit(a)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), buckets) < accept)
  }
}

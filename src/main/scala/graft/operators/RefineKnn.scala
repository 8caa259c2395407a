package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DistanceMetric, VectorFunctions}

/** Exact-float REFINEMENT of an approximate candidate pool — the
  * standard two-stage serve (FAISS `IndexRefineFlat`, DiskANN's
  * full-precision rerank): stage 1 produces a per-query candidate pool
  * by any cheap means (SQ8 graph beam / exact SQ8 scan / IVF-PQ ADC),
  * stage 2 re-scores ONLY the pool with full-precision vectors from the
  * base relation and keeps the top k.
  *
  * Why this exists: a quantized index's recall is CEILING-limited by
  * its code resolution — the 100M clustered decade pins the SQ8
  * [0,1]-range ceiling at 0.959 recall@10 (SCALE.md), and that floor is
  * intrinsic to 8-bit codes on a corpus whose values span the whole
  * range (range CALIBRATION cannot lift it — measured). Refinement
  * removes the ceiling without touching the index: quantization error
  * only has to keep the true neighbors inside the top-`pool`, not the
  * top-k.
  *
  * 100 TB shape: the pool is |queries| × pool rows — BOUNDED, the
  * broadcast side. The base relation streams once per query batch
  * (column-pruned to (id, embedding); the per-row hash probe is cheaper
  * than a distance eval, so the refine pass costs LESS than one exact
  * scan and amortizes over the whole batch), and the full-precision
  * distance is evaluated only for pool hits. Nothing corpus-sized is
  * collected, shuffled, or windowed: the window ranks |Q| × pool rows.
  * Reference counterpart: none — dehnsw.h serves straight from its
  * quantized codes; this is the engine's ceiling-breaking tier.
  */
object RefineKnn {

  /** Re-score `pool` (query_id, neighbor_id) against full-precision
    * vectors from `base` (id, embedding) and keep the per-query top-k
    * by `metric` over (queries.embedding, base.embedding) — RAW vectors
    * on both sides, so for a transforming index (cosine / MIPS) pass
    * the SEMANTIC metric, not the index's internal one.
    * Output: (query_id, rank, neighbor_id, distance) — [[graft.index
    * .VectorIndex.query]]'s schema with full-precision distances.
    *
    * CONTRACT: `base` must cover every pool id. The rerank is an inner
    * join, so a pool id absent from `base` (a mispointed or stale base
    * relation) silently drops that candidate — fewer-than-k rows or
    * shifted ranks, no error. Callers who cannot trust the base by
    * construction should pass `requireCoverage = true`: the pool and
    * the scored pool are each pinned once (bounded, |Q| × pool rows)
    * and their row counts compared — a mismatch throws instead of
    * degrading; stage 1 never re-runs for the check. Costs one extra count over the bounded frame, so it is
    * off by default for the gated closed-form paths whose base IS the
    * build corpus. */
  def refine(pool: DataFrame, queries: DataFrame, base: DataFrame, k: Int,
      metric: DistanceMetric = DistanceMetric.Euclidean2,
      requireCoverage: Boolean = false): DataFrame = {
    val p0 = pool.select(col("query_id").cast("long"),
      col("neighbor_id").cast("long"))
    // under coverage checking the pool feeds TWO consumers (the rerank
    // join and the coverage count) — pin it so stage 1 runs ONCE; an
    // unpinned pool would re-run the whole stage-1 probe (a full exact
    // scan for the sw=0 refine face) for the count, doubling the serve
    // cost the calibration table then records as the face's ms/query
    val p = if (requireCoverage) p0.localCheckpoint(true) else p0
    val q = queries.select(col("query_id").cast("long"),
      col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("neighbor_id"))
    val scored = base
      .select(col("id"), col("embedding"))
      .join(broadcast(p), col("id") === col("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.distance(metric, col("q_emb"), col("embedding"))
          .cast("double").as("distance"))
    val checked = if (!requireCoverage) scored else {
      val pinned = scored.localCheckpoint(true)
      // p is pinned above: this count reads checkpoint blocks, not lineage
      val (nPool, nScored) = (p.count(), pinned.count())
      require(nScored == nPool,
        s"RefineKnn: base covers only $nScored of $nPool pool candidates — " +
          "the base relation is stale or mispointed; refusing a silently " +
          "degraded rerank")
      pinned
    }
    checked
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("distance"))
  }
}

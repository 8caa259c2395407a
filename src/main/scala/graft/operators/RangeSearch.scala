package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Radius (range) search — every corpus vector within squared-L2
  * distance `r2` of each query, the ANN face the reference's top-k-only
  * API (source/dehnsw.h:512-529) never exposes but every
  * retrieval/dedup stack eventually needs ("give me ALL matches closer
  * than t", e.g. near-duplicate candidate generation at a fixed
  * similarity threshold, not a fixed k).
  *
  * Two faces, both EXACT:
  *  - [[rangeJoin]]: brute force — broadcast the bounded query batch,
  *    scan the corpus once, keep rows with distance <= r2. One map-side
  *    pass, no corpus shuffle; the correctness baseline.
  *  - [[rangeJoinPruned]]: IVF-cell triangle-inequality pruning — the
  *    100 TB shape. The corpus is assigned to bounded IVF cells (the
  *    [[IvfKnn]] argmin expression: per-row codegen, no shuffle); one
  *    aggregate computes each cell's L2 radius (max member distance to
  *    its centroid); a (query x cell) pair is scanned only when the
  *    triangle bound admits it: d(q, centroid) - cellRadius <= r.
  *    Every scanned row is verified with the exact distance, and a
  *    skipped cell provably contains no qualifying row (for any member
  *    x: d(q,x) >= d(q,c) - d(x,c) >= d(q,c) - cellRadius > r), so
  *    pruning never changes the answer — RangeSearchSpec pins
  *    pruned == brute force AND that pruning actually engages. The
  *    bound is evaluated in double with a small relative slack so float
  *    rounding can only over-scan, never under-scan.
  *
  * Scale notes: cells are bounded (numCentroids rows), so cell stats
  * and the surviving (query, cell) pair list broadcast; the corpus is
  * scanned exactly once with the equi-join on `cell` discarding pruned
  * cells' members before any distance work. Output volume is the true
  * result size — range search with a sane radius is output-bounded by
  * construction, unlike top-k whose k*|Q| floor is paid even when
  * everything is far away.
  */
object RangeSearch {

  /** Brute-force exact range search.
    * queries(query_id, embedding) x corpus(id, embedding)
    * -> (query_id, id, distance), distance = squared L2 <= r2. */
  def rangeJoin(queries: DataFrame, corpus: DataFrame, r2: Double): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_embedding"))
    corpus.crossJoin(broadcast(q))
      .withColumn("distance",
        VectorFunctions.squaredL2(col("q_embedding"), col("embedding")))
      .filter(col("distance") <= lit(r2))
      .select(col("query_id"), col("id"), col("distance"))
  }

  /** IVF-cell-pruned exact range search — same contract and (provably)
    * same answer as [[rangeJoin]]; only the scanned fraction differs. */
  def rangeJoinPruned(
      queries: DataFrame,
      corpus: DataFrame,
      r2: Double,
      numCentroids: Int): DataFrame =
    rangeJoinPrunedWith(queries, corpus, r2, IvfKnn.centroids(corpus, numCentroids))

  /** [[rangeJoinPruned]] with a caller-supplied centroid relation —
    * trained cells ([[IvfKnn.trainedCentroids]]) have smaller radii on
    * clustered data, so the SAME triangle bound admits fewer (query,
    * cell) pairs and the one corpus scan touches fewer members; the
    * answer is identical by the same proof (the bound only consults the
    * supplied cells' own radii). */
  def rangeJoinPrunedWith(
      queries: DataFrame,
      corpus: DataFrame,
      r2: Double,
      cents: DataFrame): DataFrame = {
    require(r2 >= 0, s"radius must be non-negative (got $r2)")
    // degenerate corpus (deterministic centroid sample empty) -> no
    // cells to prune with; the brute-force face is the correct answer
    if (cents.isEmpty) return rangeJoin(queries, corpus, r2)
    val assigned = IvfKnn.assign(corpus, cents)
    // per-cell L2 radius: one aggregate over the (unshuffled-assign)
    // corpus; the centroid table is bounded and broadcasts
    val admitted = admittedCells(queries, cents, cellRadii(assigned, cents), r2)
    // one corpus scan; members of never-admitted cells drop at the join
    assigned.join(broadcast(admitted), Seq("cell"))
      .withColumn("distance",
        VectorFunctions.squaredL2(col("q_embedding"), col("embedding")))
      .filter(col("distance") <= lit(r2))
      .select(col("query_id"), col("id"), col("distance"))
  }

  /** Triangle-inequality admission over the bounded (query x cell) grid
    * — exposed for the spec, which asserts pruning ENGAGES (admitted
    * rows < |queries| x cells on a clustered corpus), not just that the
    * answer survives it. Relative slack keeps float rounding on the
    * over-scan side. */
  private[graft] def admittedCells(
      queries: DataFrame, cents: DataFrame, cellRadius: DataFrame,
      r2: Double): DataFrame = {
    val r = math.sqrt(r2)
    val slack = 1e-9 * (1.0 + r)
    queries
      .select(col("query_id"), col("embedding").as("q_embedding"))
      .crossJoin(broadcast(cellRadius.join(cents, col("cell") === col("centroid_id"))
        .select(col("cell"), col("cell_radius"), col("c_embedding"))))
      .filter(
        sqrt(VectorFunctions.squaredL2(col("q_embedding"), col("c_embedding")))
          - col("cell_radius") <= lit(r + slack))
      .select(col("query_id"), col("q_embedding"), col("cell"))
  }

  /** The per-cell L2 radius table (max member distance to the member's
    * own centroid) — factored for reuse by [[admittedCells]] callers. */
  private[graft] def cellRadii(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned
      .join(broadcast(cents), col("cell") === col("centroid_id"))
      .withColumn("d2c",
        sqrt(VectorFunctions.squaredL2(col("embedding"), col("c_embedding"))))
      .groupBy(col("cell")).agg(max(col("d2c")).as("cell_radius"))
}

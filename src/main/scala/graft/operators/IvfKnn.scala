package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate kNN — the coarse-quantizer scale path:
  * corpus vectors are assigned to their nearest centroid cell; a query
  * probes only the `nprobe` nearest cells, so the scan shrinks by
  * ~numCentroids/nprobe while close vectors tend to share cells.
  *
  * The coarse quantizer here is deterministic sampling (every stride-th
  * corpus vector in id-rank order is a centroid) rather than trained
  * k-means, so the whole operator — assignment included — is reproducible
  * in plain SQL and hash-checked against DuckDB. Swapping in trained
  * centroids changes only the centroid relation, not the plan shape.
  *
  * Scale notes: centroids are broadcast twice (assignment + query
  * routing); the only corpus-sized work is one broadcast-join pass for
  * assignment; the probe joins queries to cells on cell id (equi-join on
  * the posting lists) — never the full cross product.
  */
object IvfKnn {

  /** Deterministic centroid sample: vectors whose id % stride == 0,
    * stride = ceil(max_id / numCentroids). A pure per-row predicate — no
    * global sort/window, so sampling scales as a plain filtered scan (a
    * rank-based scheme would funnel the corpus through one partition). */
  def centroids(corpus: DataFrame, numCentroids: Int): DataFrame = {
    val maxId = corpus.agg(max(col("id"))).head.getLong(0)
    val stride = math.max(1L, (maxId + numCentroids) / numCentroids)
    corpus
      .filter(col("id") % stride === 0)
      .select(col("id").as("centroid_id"), col("embedding").as("c_embedding"))
  }

  /** Cell assignment: nearest centroid per corpus vector (ties by
    * centroid id). */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(cents))
      .withColumn("cdist",
        VectorFunctions.squaredL2(col("embedding"), col("c_embedding")))
    val w = Window.partitionBy(col("id")).orderBy(col("cdist"), col("centroid_id"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("id"), col("embedding"), col("centroid_id").as("cell"))
  }

  /** IVF kNN: probe the nprobe nearest cells per query, exact top-k among
    * their members (may return fewer than k — the approximation).
    * Output (query_id, rank, neighbor_id, distance). */
  def knnJoin(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, numCentroids).cache()
    val assigned = assign(corpus, cents)
    val qCells = {
      val scored = queries.crossJoin(broadcast(cents))
        .withColumn("cdist",
          VectorFunctions.squaredL2(col("embedding"), col("c_embedding")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("centroid_id"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= nprobe)
        .select(col("query_id"), col("embedding").as("q_embedding"),
          col("centroid_id").as("cell"))
    }
    val scored = assigned.join(broadcast(qCells), Seq("cell"))
      .withColumn("distance",
        VectorFunctions.squaredL2(col("q_embedding"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("distance"), col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("distance"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DistanceMetric, VectorFunctions}

/** Exact batch kNN — the reference's RM=0 exhaustive-search semantics
  * (reference: source/dehnsw.h:300-307 — searchWidth 0 never triggers the
  * early stop, i.e. exact search), expressed as a declarative Catalyst plan.
  *
  * Contract (matches the intended multi-shard `query_with_sub_index`,
  * reference: source/dehnsw.h:532-587, plus distances which the pybind API
  * drops, python_binding/dehnswpy.cpp:28-35):
  *   knnJoin(queries(query_id, embedding), corpus(id, embedding), k)
  *     -> (query_id, rank, neighbor_id, distance), rank 1..k ascending,
  *        ties broken by neighbor id (deterministic).
  *
  * Scale notes (100 TB design):
  *  - The query batch is the small side: it is broadcast, so the corpus is
  *    scanned exactly once with no shuffle of the corpus itself.
  *  - The window variant shuffles (query_id, distance, id) candidate rows —
  *    |corpus| x |queries| rows. Fine for moderate batches; for large
  *    batches use [[graft.operators.TopK.knnAggregate]] which does
  *    partial per-partition top-k before the shuffle (partial/final
  *    aggregate — the Spark analog of the reference's per-shard
  *    top-k + merge, dehnsw.h:572-580).
  */
object ExactKnn {

  /** Window-rank formulation: crossJoin(broadcast(queries)) + per-query rank. */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: DistanceMetric = DistanceMetric.Euclidean2): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_embedding"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_embedding"))
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("distance",
        VectorFunctions.distance(metric, col("q_embedding"), col("c_embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("distance"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
  }
}

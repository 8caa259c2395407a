package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation operators around kNN — the reference's recall harness
  * (SURVEY §2.4 E1/E2), as declarative joins + conditional aggregation.
  */
object RecallEval {

  /** E1 `get_reference_answer` (reference: example/dehnsw_example.cpp:10-24):
    * exact distances from each query to its ground-truth neighbors.
    * groundTruth: (query_id, rank, neighbor_id); queries/corpus with
    * embeddings. Two equi-joins + the distance expression. */
  def referenceAnswer(
      groundTruth: DataFrame, queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_embedding"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_embedding"))
    groundTruth
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.VectorFunctions.squaredL2(col("q_embedding"), col("c_embedding"))
          .as("distance"))
  }

  /** E2 distance-based recall (reference: example/dehnsw_example.cpp:26-44):
    * rank-wise compare — a returned distance counts as a hit when it is at
    * least as close as the ground-truth distance at the same rank
    * (tie-tolerant: a different id at equal distance still hits).
    * Inputs: (query_id, rank, distance) each. Output per query:
    * (query_id, hits, recall). */
  def recallByQuery(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    val res = results.select(col("query_id"), col("rank"), col("distance").as("res_dist"))
    val gt = groundTruth.select(col("query_id"), col("rank"), col("distance").as("gt_dist"))
    res.join(gt, Seq("query_id", "rank"))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("res_dist") <= col("gt_dist"), 1).otherwise(0)).as("hits"),
        round(sum(when(col("res_dist") <= col("gt_dist"), 1).otherwise(0)) / lit(k), 6)
          .as("recall"))
  }

  /** Labeled set-recall report — the retrieval-quality face when ground
    * truth is a relevance SET (query_id, doc_id) instead of ranked
    * distances (hybrid stacks: a doc can be relevant lexically with no
    * meaningful distance): for each named system's result list,
    * hits = |results ∩ relevant| and the shared denominator
    * total = |relevant|, so systems compare on identical footing. One
    * semi-join + scalar aggregate per system over top-k-sized lists —
    * nothing corpus-sized moves regardless of corpus scale. */
  def labeledRecall(
      systems: Seq[(String, DataFrame)], relevant: DataFrame): DataFrame = {
    require(systems.nonEmpty, "labeledRecall needs at least one system")
    val spark = relevant.sparkSession
    import spark.implicits._
    // eager: the report is |systems| scalars — computing them as actions
    // lets the relevance cache be RELEASED before returning (a lazily
    // consumed cache would leak in the block manager per call), and the
    // returned frame is a k-row local relation with no live lineage
    val rel = relevant.select(col("query_id"), col("doc_id")).distinct().cache()
    val total = rel.count()
    val rows =
      try systems.map { case (name, res) =>
        val hits = res.select(col("query_id"), col("doc_id")).distinct()
          .join(rel, Seq("query_id", "doc_id"), "left_semi")
          .count()
        (name, hits, total)
      }
      finally rel.unpersist()
    rows.sortBy(_._1).toDF("system", "hits", "total")
  }
}

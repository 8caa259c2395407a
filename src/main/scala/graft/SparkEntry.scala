package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{DistanceMetric, VectorFunctions}
import graft.operators.ExactKnn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in [[oracleSql]]
  * (same column names, same deterministic ordering, same rounding) unless
  * the operator is not SQL-expressible.
  *
  * Float determinism policy: all money/measure aggregates go through
  * DECIMAL (exact, order-independent) and only convert to DOUBLE at the
  * end; all vector distances are computed as sequential left-to-right
  * Double folds over array index order, which DuckDB's list lambdas
  * reproduce bit-for-bit; every query output is totally ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact batch kNN through the custom fused Catalyst operator
    * (SURVEY §7.1 M0 contract, fastest formulation). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    graft.plans.KnnJoinPlan.knnFused(queries, corpus, k = 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational shell (SURVEY §2.5: scans, filters, aggs, joins, windows, sort/limit) ----
    "q1_agg" -> ((s, dir) => Queries.q1Agg(s, dir)),
    "q2_join" -> ((s, dir) => Queries.q2Join(s, dir)),
    "q3_topk_orders" -> ((s, dir) => Queries.q3TopkOrders(s, dir)),
    "q4_window" -> ((s, dir) => Queries.q4Window(s, dir)),
    "q5_semi_anti" -> ((s, dir) => Queries.q5SemiAnti(s, dir)),
    // ---- vector / distance operators (SURVEY §2.2 D1-D4) ----
    "v1_distances" -> ((s, dir) => Queries.v1Distances(s, dir)),
    // ---- kNN (SURVEY §2.1 O6/O8 exact mode) ----
    "v4_knn_exact" -> ((s, dir) => Queries.v4KnnExact(s, dir)),
    "v5_knn_topk" -> ((s, dir) => Queries.v5KnnTopk(s, dir)),
    // ---- dehnsw ANN index (SURVEY §2.1 O1-O10) ----
    "v6_ann_exact" -> ((s, dir) => Queries.v6AnnExact(s, dir)),
    "v7_recall" -> ((s, dir) => Queries.v7Recall(s, dir)),
    "v8_ann_probe" -> ((s, dir) => Queries.v8AnnProbe(s, dir)),
    "v9_index_stats" -> ((s, dir) => Queries.v9IndexStats(s, dir)),
    "v10_lsh_ann" -> ((s, dir) => Queries.v10LshAnn(s, dir)),
    "v11_knn_fused" -> ((s, dir) => Queries.v11KnnFused(s, dir)),
    "v12_centroids" -> ((s, dir) => Queries.v12Centroids(s, dir)),
    "v13_knn_cosine" -> ((s, dir) => Queries.v13KnnCosine(s, dir)),
    "v14_ivf_ann" -> ((s, dir) => Queries.v14IvfAnn(s, dir)),
    "v15_lsh_multiprobe" -> ((s, dir) => Queries.v15LshMultiprobe(s, dir)),
    "v16_sql_ann_rewrite" -> ((s, dir) => Queries.v16SqlAnnRewrite(s, dir)),
    "v17_saveload" -> ((s, dir) => Queries.v17Saveload(s, dir)),
    "v18_sql_text" -> ((s, dir) => Queries.v18SqlText(s, dir)),
    "v19_append" -> ((s, dir) => Queries.v19Append(s, dir)),
    "v20_bucketed_build" -> ((s, dir) => Queries.v20BucketedBuild(s, dir)),
    "v21_sq8_knn" -> ((s, dir) => Queries.v21Sq8Knn(s, dir)),
    "v22_sq8_rerank" -> ((s, dir) => Queries.v22Sq8Rerank(s, dir)),
    "v23_sq8_index" -> ((s, dir) => Queries.v23Sq8Index(s, dir)),
    "v24_filtered_knn" -> ((s, dir) => Queries.v24FilteredKnn(s, dir)),
    "v25_sq8_calibrated" -> ((s, dir) => Queries.v25Sq8Calibrated(s, dir)),
    "v26_sq8_beam" -> ((s, dir) => Queries.v26Sq8Beam(s, dir)),
    "v51_sq8_cosine" -> ((s, dir) => Queries.v51Sq8Cosine(s, dir)),
    "v54_mips_index" -> ((s, dir) => Queries.v54MipsIndex(s, dir)),
    "v59_width_calibration" -> ((s, dir) => Queries.v59WidthCalibration(s, dir)),
    "v52_retrieval_quality" -> ((s, dir) => Queries.v52RetrievalQuality(s, dir)),
    "v27_pq_knn" -> ((s, dir) => Queries.v27PqKnn(s, dir)),
    "v28_pq_rerank" -> ((s, dir) => Queries.v28PqRerank(s, dir)),
    "v29_ivfpq" -> ((s, dir) => Queries.v29IvfPq(s, dir)),
    "v30_ivfpq_residual" -> ((s, dir) => Queries.v30IvfPqResidual(s, dir)),
    "v64_ivfpq_routed" -> ((s, dir) => Queries.v64IvfPqRouted(s, dir)),
    "v65_refined_knn" -> ((s, dir) => Queries.v65RefinedKnn(s, dir)),
    "v67_refined_beam" -> ((s, dir) => Queries.v67RefinedBeam(s, dir)),
    "v68_sharded_layout" -> ((s, dir) => Queries.v68ShardedLayout(s, dir)),
    "v69_face_serve" -> ((s, dir) => Queries.v69FaceServe(s, dir)),
    "v31_binary_knn" -> ((s, dir) => Queries.v31BinaryKnn(s, dir)),
    "v32_binary_rerank" -> ((s, dir) => Queries.v32BinaryRerank(s, dir)),
    "v33_knn_mips" -> ((s, dir) => Queries.v33KnnMips(s, dir)),
    "v34_binary_centered" -> ((s, dir) => Queries.v34BinaryCentered(s, dir)),
    "v35_binary_projected" -> ((s, dir) => Queries.v35BinaryProjected(s, dir)),
    "v36_pq_trained" -> ((s, dir) => Queries.v36PqTrained(s, dir)),
    "v37_filtered_rewrite" -> ((s, dir) => Queries.v37FilteredRewrite(s, dir)),
    "v57_cosine_rewrite" -> ((s, dir) => Queries.v57CosineRewrite(s, dir)),
    "v58_mips_rewrite" -> ((s, dir) => Queries.v58MipsRewrite(s, dir)),
    "v38_maxsim" -> ((s, dir) => Queries.v38MaxSim(s, dir)),
    "v39_maxsim_pruned" -> ((s, dir) => Queries.v39MaxSimPruned(s, dir)),
    "v40_maxsim_ann" -> ((s, dir) => Queries.v40MaxSimAnn(s, dir)),
    "v41_opq_knn" -> ((s, dir) => Queries.v41OpqKnn(s, dir)),
    "b1_bucketed_join" -> ((s, dir) => Queries.b1BucketedJoin(s, dir)),
    "b2_salted_join" -> ((s, dir) => Queries.b2SaltedJoin(s, dir)),
    "b3_asof_join" -> ((s, dir) => Queries.b3AsofJoin(s, dir)),
    "b4_range_join" -> ((s, dir) => Queries.b4RangeJoin(s, dir)),
    "b5_interval_join" -> ((s, dir) => Queries.b5IntervalJoin(s, dir)),
    "b6_zorder" -> ((s, dir) => Queries.b6Zorder(s, dir)),
    "v48_knn_graph" -> ((s, dir) => Queries.v48KnnGraph(s, dir)),
    "v49_knn_graph_ann" -> ((s, dir) => Queries.v49KnnGraphAnn(s, dir)),
    "v50_graph_clusters" -> ((s, dir) => Queries.v50GraphClusters(s, dir)),
    "q6_rollup" -> ((s, dir) => Queries.q6Rollup(s, dir)),
    "q8_cube" -> ((s, dir) => Queries.q8Cube(s, dir)),
    "q7_dates" -> ((s, dir) => Queries.q7Dates(s, dir)),
    "q9_grouping_sets" -> ((s, dir) => Queries.q9GroupingSets(s, dir)),
    "q10_pivot" -> ((s, dir) => Queries.q10Pivot(s, dir)),
    "q11_set_ops" -> ((s, dir) => Queries.q11SetOps(s, dir)),
    "q12_range_frame" -> ((s, dir) => Queries.q12RangeFrame(s, dir)),
    "q13_subqueries" -> ((s, dir) => Queries.q13Subqueries(s, dir)),
    "q14_percentiles" -> ((s, dir) => Queries.q14Percentiles(s, dir)),
    "q15_percentile_sketch" -> ((s, dir) => Queries.q15PercentileSketch(s, dir)),
    "v53_range_search" -> ((s, dir) => Queries.v53RangeSearch(s, dir)),
    "v56_range_trained" -> ((s, dir) => Queries.v56RangeTrained(s, dir)),
    "v47_mrl_knn" -> ((s, dir) => Queries.v47MrlKnn(s, dir)),
    "v42_hybrid_rrf" -> ((s, dir) => Queries.v42HybridRrf(s, dir)),
    "v43_lsm_delete" -> ((s, dir) => Queries.v43LsmDelete(s, dir)),
    "v44_hybrid_ann" -> ((s, dir) => Queries.v44HybridAnn(s, dir)),
    "v45_residual_trained" -> ((s, dir) => Queries.v45ResidualTrained(s, dir)),
    "v46_hybrid_bm25" -> ((s, dir) => Queries.v46HybridBm25(s, dir)),
    "v60_hybrid_snapshot" -> ((s, dir) => Queries.v60HybridSnapshot(s, dir)),
    "v62_hybrid_production" -> ((s, dir) => Queries.v62HybridProduction(s, dir)),
    "t5_json" -> ((s, dir) => Queries.t5Json(s, dir))
  ) ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles ++ PipelineQueries.oracles
}

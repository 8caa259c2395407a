package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Multi-vector (late-interaction / ColBERT-style) retrieval: a document is
  * a SET of vectors, a query is a SET of vectors, and
  *
  *   score(Q, D) = sum over q in Q of ( max over d in D of <q, d> )
  *
  * — each query token picks its best-matching document token, and the
  * per-token winners sum. This is the scoring model of ColBERT (Khattab &
  * Zaharia, SIGIR'20); the reference engine itself has no multi-vector
  * mode, but an LLM retrieval stack over 100 TB of token embeddings does.
  *
  * Plan shape (exact scorer): corpus token vectors NEVER shuffle — the
  * query set broadcasts, every corpus partition scores its own tokens, and
  * the two aggregations (max per query-token x doc, then sum per
  * query-doc x doc) both run partial map-side, so the exchange carries one
  * row per (query doc, doc) pair bound, not per token pair. At cluster
  * scale the same composition runs after an ANN candidate step — per
  * query-token kNN via the dehnsw index over the token table, union
  * candidates, rerank with this exact scorer over the shortlist — which
  * [[maxSimTopKAnn]] implements; the exact-path gated queries keep the
  * full scorer so DuckDB can replay them. */
object MultiVector {

  /** Exact maxsim top-k.
    *
    * `queryVectors`:  (qid, qvec, embedding) — one row per query token,
    *                  `qvec` a token id unique within its qid.
    * `corpusVectors`: (did, embedding) — one row per document token.
    * Returns (qid, rank, did, score), rank 1..k by (score desc, did asc).
    * Scores are sequential-fold Double dot products; the final sum spans
    * one value per query token (ulp-level error, orders below the round(6)
    * reporting grain — same argument as the centroid aggregate). */
  def maxSimTopK(queryVectors: DataFrame, corpusVectors: DataFrame, k: Int): DataFrame = {
    val qv = queryVectors.select(col("qid"), col("qvec"), col("embedding").as("qe"))
    val cv = corpusVectors.select(col("did"), col("embedding").as("ce"))
    val perToken = cv
      .crossJoin(broadcast(qv))
      .select(col("qid"), col("qvec"), col("did"),
        VectorFunctions.dotProduct(col("qe"), col("ce")).as("ip"))
      .groupBy(col("qid"), col("qvec"), col("did"))
      .agg(max(col("ip")).as("best"))
    val scored = perToken
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("best")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("did"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("did"), col("score"))
  }

  /** Two-stage maxsim — the composition that runs at cluster scale, where
    * scoring every (query doc, doc) pair is off the table:
    *
    *  1. candidate generation: per query TOKEN, the top `m` corpus tokens
    *     by inner product (k-bounded partial/final top-k — the same
    *     machinery as the SQ8/PQ rerank pipelines); the docs owning those
    *     tokens become the query doc's candidate set;
    *  2. exact rerank: the full maxsim scorer, restricted to candidate
    *     doc tokens only.
    *
    * With m generous relative to doc token counts the candidate set covers
    * the true top-k and the result EQUALS the brute-force scorer — which
    * is how the gated query oracles it (v39 == v38's oracle). At scale,
    * stage 1 runs through the ANN index instead of the exact top-m; the
    * rerank is unchanged.
    *
    * `corpusVectors` here needs (did, tokid, embedding) — tokid the
    * corpus-unique token id stage 1 ranks on. */
  def maxSimTopKPruned(
      queryVectors: DataFrame, corpusVectors: DataFrame,
      k: Int, m: Int): DataFrame = {
    val qv = queryVectors.select(col("qid"), col("qvec"), col("embedding"))
    val cv = corpusVectors.select(col("did"), col("tokid"), col("embedding"))
    // stage 1: per query token, top-m corpus tokens by inner product
    val perTokenTop = ExactKnn.knnJoin(
      qv.select(col("qvec").as("query_id"), col("embedding")),
      cv.select(col("tokid").as("id"), col("embedding")),
      k = m, graft.functions.DistanceMetric.InnerProduct)
    rerankCandidates(qv, cv, candidateDocs(perTokenTop, qv, cv), k)
  }

  /** ANN-candidate maxsim — the composition that actually prunes at
    * cluster scale: stage 1 probes a dehnsw index built over the corpus
    * TOKEN table (id = tokid, metric = inner product) with the beam
    * search, so candidate generation touches only the beam's graph walk
    * per shard — never a full corpus-token scan — and stage 2 is the same
    * exact rerank as [[maxSimTopKPruned]]. This is the promise in this
    * file's header made real: per-query-token kNN via the index, union
    * candidates, rerank exact over the shortlist.
    *
    * Fidelity dial: at exhaustive `searchWidth`/`m` the candidate set
    * covers everything and the result EQUALS the brute-force scorer
    * (how the gated query oracles it against v38's SQL); at realistic
    * width the result is approximate and MultiVectorSpec pins the
    * doc-level recall floor. Stage-1 beam distances only SELECT
    * candidates — final scores always come from the exact Double rerank,
    * so fp32 beam arithmetic never reaches the output. */
  def maxSimTopKAnn(
      queryVectors: DataFrame, corpusVectors: DataFrame,
      index: graft.index.VectorIndex,
      k: Int, m: Int, searchWidth: Int): DataFrame = {
    require(index.params.metric == graft.functions.DistanceMetric.InnerProduct,
      s"maxsim stage 1 ranks by inner product; index metric is ${index.params.metric.name}")
    val qv = queryVectors.select(col("qid"), col("qvec"), col("embedding"))
    val cv = corpusVectors.select(col("did"), col("tokid"), col("embedding"))
    val perTokenTop = index.query(
      qv.select(col("qvec").as("query_id"), col("embedding")),
      k = m, searchWidth = searchWidth)
    rerankCandidates(qv, cv, candidateDocs(perTokenTop, qv, cv), k)
  }

  /** Stage-1 postlude shared by the pruned/ANN forms: per-query-token
    * (query_id, neighbor_id) winners → distinct (qid, did) candidates.
    * Both joins are slim equi-joins on ids (the probe side is bounded at
    * queries x m rows, so Catalyst broadcasts it from stats). */
  private def candidateDocs(
      perTokenTop: DataFrame, qv: DataFrame, cv: DataFrame): DataFrame =
    perTokenTop
      .join(qv.select(col("qvec").as("query_id"), col("qid")), "query_id")
      .join(cv.select(col("tokid").as("neighbor_id"), col("did")), "neighbor_id")
      .select(col("qid"), col("did")).distinct()

  /** Stage 2 shared by the pruned/ANN forms: the exact maxsim scorer
    * restricted to candidate docs' tokens — same partial map-side
    * aggregation shape as [[maxSimTopK]], with the corpus side bounded by
    * the candidate join instead of scored in full. */
  private def rerankCandidates(
      qv: DataFrame, cv: DataFrame, candDocs: DataFrame, k: Int): DataFrame = {
    val candTokens = cv.join(candDocs, Seq("did"))
      .select(col("qid"), col("did"), col("embedding").as("ce"))
    val perToken = candTokens
      .join(broadcast(qv.select(col("qid"), col("qvec"), col("embedding").as("qe"))), Seq("qid"))
      .select(col("qid"), col("qvec"), col("did"),
        VectorFunctions.dotProduct(col("qe"), col("ce")).as("ip"))
      .groupBy(col("qid"), col("qvec"), col("did"))
      .agg(max(col("ip")).as("best"))
    val scored = perToken
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("best")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("did"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("did"), col("score"))
  }
}

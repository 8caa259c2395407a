package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hybrid lexical + dense retrieval fused with Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009): each leg produces a
  * per-query top-N ranking; the fused score of a document is
  * sum over legs of 1 / (c + rank), missing-from-a-leg contributing 0.
  * RRF needs only RANKS — never score calibration across legs — which is
  * exactly what makes it the standard fusion for BM25-style lexical
  * scores (unbounded) against cosine similarities ([-1, 1]).
  *
  * Scale shape: each leg is an existing scalable operator (the dense leg
  * is any kNN operator from this library — exact, dehnsw, IVF, PQ; the
  * lexical leg is one posting equi-join + partial count). Fusion itself
  * touches only the q x N ranked rows: a full-outer equi-join on
  * (query, doc) plus a per-query top-k window — negligible next to the
  * legs at any corpus size.
  */
object HybridRetrieval {

  /** Lexical leg: per-query ranking by shared-DISTINCT-token count (the
    * boolean-overlap retrieval model). Integer scores make the ranking
    * engine-exact (no float summation order to disagree on). One posting
    * equi-join on the token (queries' distinct tokens broadcast — the
    * query batch is bounded by contract), one partial-aggregated count,
    * one per-query window limit.
    *
    * @param queries (query_id, text)
    * @param corpus (doc_id, text)
    * @param maxTokenDf drop tokens whose CORPUS document frequency
    *   exceeds this ceiling before the posting join — the 100 TB knob
    *   (d2's `maxShingleDf` applied to tokens). Without it one stopword
    *   in a query matches essentially every document and the
    *   pre-aggregation pair stream approaches q x corpus. An
    *   overlap count over df-capped tokens is still a valid ranking —
    *   a near-universal token carries no discriminative signal — but it
    *   IS a different ranking from the uncapped one (deliberate,
    *   documented semantics; the default keeps exact overlap).
    *   Scale shape: with the ceiling a fixed fraction f of the corpus,
    *   at most avg_doc_len/f tokens can exceed it — a corpus-size-
    *   independent set, computed by one token groupBy and removed via a
    *   BROADCAST anti-join, so the cap never adds a corpus-sized shuffle.
    * @return (query_id, doc_id, n_shared, lex_rank), lex_rank <= n
    */
  def lexicalTopN(queries: DataFrame, corpus: DataFrame, n: Int,
      maxTokenDf: Long = Long.MaxValue): DataFrame = {
    def toks(df: DataFrame, idAs: String, idFrom: String) = df.select(
      col(idFrom).as(idAs),
      explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
    val qt = toks(queries, "query_id", "query_id")
    val ct0 = toks(corpus, "doc_id", "doc_id")
    val ct =
      if (maxTokenDf == Long.MaxValue) ct0
      else {
        val hot = ct0.groupBy(col("tok"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxTokenDf)
          .select(col("tok"))
        ct0.join(broadcast(hot), Seq("tok"), "left_anti")
      }
    val overlap = ct.join(broadcast(qt), Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    overlap
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("n_shared").desc, col("doc_id"))).cast("int"))
      .filter(col("lex_rank") <= n)
  }

  /** RRF fusion of two per-query rankings. Inputs carry
    * (query_id, doc_id, <rankCol>); docs absent from a leg contribute 0
    * to the fused score and surface with that leg's rank reported as 0
    * (sentinel — never a real rank, which is 1-based).
    *
    * @return (query_id, rank, doc_id, rrf, <denseRankCol>, <lexRankCol>)
    *         top `k` per query by (rrf desc, doc_id)
    */
  def rrfFuse(dense: DataFrame, lex: DataFrame, k: Int,
      denseRankCol: String = "dense_rank", lexRankCol: String = "lex_rank",
      c: Int = 60): DataFrame = {
    val d = dense.select(col("query_id"), col("doc_id"),
      col(denseRankCol).cast("int").as("rd"))
    val s = lex.select(col("query_id"), col("doc_id"),
      col(lexRankCol).cast("int").as("rs"))
    d.join(s, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("rd")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rs")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
        coalesce(col("rd"), lit(0)).as(denseRankCol),
        coalesce(col("rs"), lit(0)).as(lexRankCol))
  }
}

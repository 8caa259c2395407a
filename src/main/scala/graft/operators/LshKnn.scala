package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** LSH-bucketed approximate kNN — the bucketed "scale path" for similarity
  * search: signed-random-projection signatures put each vector in one of
  * 2^numPlanes buckets; candidates are only same-bucket pairs, so the
  * pair space shrinks by ~2^numPlanes while cosine-close vectors tend to
  * share signs.
  *
  * The hyperplanes are deterministic integer lattices
  * h_i[j] = ((i*37 + j*13) mod 7) - 3, so the whole operator (signature
  * included) is reproducible in plain SQL — the DuckDB oracle recomputes
  * identical buckets. For production-scale use the planes would be seeded
  * Gaussians; the operator shape is identical.
  */
object LshKnn {

  /** Bucket id: numPlanes sign bits, computed in one pass by the native
    * expression (bit-identical to the per-plane HOF folds the DuckDB
    * oracle uses — see functions.LatticeBucket). */
  def bucket(v: Column, numPlanes: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(
      graft.functions.LatticeBucket(GraftSqlBridge.expression(v), numPlanes))
  }

  /** Bucketed kNN: top-k per query among same-bucket corpus vectors (may
    * return fewer than k when the bucket is small — the approximation).
    * Output (query_id, rank, neighbor_id, distance). */
  def knnJoin(
      queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int): DataFrame =
    knnJoinMultiProbe(queries, corpus, k, numPlanes, probeBits = 0)

  /** Multi-probe variant: each query also probes every bucket within
    * Hamming distance 1 on the first `probeBits` sign bits — the standard
    * LSH recall booster (probeBits=0 degrades to single-bucket). Corpus
    * rows are still bucketed once; only the (small) query side fans out,
    * so the join stays an equi-join on bucket. */
  def knnJoinMultiProbe(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int, probeBits: Int): DataFrame = {
    val qb = bucket(col("embedding"), numPlanes)
    val probes = array((qb +: (0 until probeBits).map(i => qb.bitwiseXOR(lit(1 << i)))): _*)
    val q = queries
      .select(col("query_id"), col("embedding").as("q_embedding"),
        explode(array_distinct(probes)).as("bucket"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_embedding"),
      bucket(col("embedding"), numPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("distance",
        VectorFunctions.squaredL2(col("q_embedding"), col("c_embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("distance"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("distance"))
  }
}

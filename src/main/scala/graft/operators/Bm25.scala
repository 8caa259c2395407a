package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Okapi BM25 relevance scoring of a corpus against a fixed term list —
  * the classic retrieval / quality-scoring primitive (Robertson & Walker,
  * SIGIR'94). For each document:
  *
  *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5))
  *
  * Scale shape: ONE corpus aggregate computes the global stats (N, avgdl,
  * df per term) — counts are exact longs and the length sum of small ints
  * is exact in double at any corpus size, so the stats row is
  * engine-deterministic; the row is then broadcast and scoring is a pure
  * map-side projection (the corpus never shuffles). Term frequencies use
  * the codegen'd higher-order `filter`, no UDFs anywhere.
  *
  * Defaults k1 = 1.5, b = 0.75 are chosen inside BM25's standard ranges
  * AND exactly representable in binary floating point, so k1+1, 1−b and
  * b·x reproduce bit-identically in any IEEE-754 engine (a k1 of 1.2
  * would make `k1+1` a rounding tie that engines may break differently).
  */
object Bm25 {

  def score(
      docs: DataFrame, terms: Seq[String],
      k1: Double = 1.5, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val withTok = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")))
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("ts"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val stats = withTok.agg(
      count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl") +: dfAggs: _*)

    val dlNorm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))
    def termScore(i: Int): Column = {
      val t = terms(i)
      val tf = size(filter(col("ts"), x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5)))
      idf * ((tf * lit(k1 + 1.0)) / (tf + lit(k1) * dlNorm))
    }
    withTok
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"),
        terms.indices.map(termScore).reduce(_ + _).as("bm25"))
  }
}

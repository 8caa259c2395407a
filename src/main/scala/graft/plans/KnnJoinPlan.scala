package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.DistanceMetric
import graft.operators.{TopK, TopKBuffer}

/** Custom whole-operator kNN candidate generation — the (c)-level
  * extension path from SURVEY §7.2: LogicalPlan node + planner Strategy +
  * physical SparkPlan.
  *
  * Why a custom operator: the declarative exact-kNN plans (crossJoin +
  * window / + typed aggregate) must route every (corpus x query) pair
  * through join-row materialization and hash-aggregate lookups. This
  * operator fuses distance + bounded heap per partition: one pass over
  * the corpus, primitive heaps per query, and only k rows per (query,
  * partition) ever exist. Same contract, same results, no intermediate.
  *
  * Children: queries (query_id LONG, embedding ARRAY<FLOAT>) — the small
  * side, collected and broadcast; corpus (id LONG, embedding
  * ARRAY<FLOAT>) — streamed. Output: per-partition candidates
  * (query_id, distance, neighbor_id), to be merged by TopK.topKMerge.
  */
case class KnnCandidates(
    queries: LogicalPlan,
    corpus: LogicalPlan,
    k: Int,
    metric: DistanceMetric,
    // output lives in the constructor so optimizer copies keep the same
    // exprIds — a fresh-attributes `val output` breaks downstream binding
    output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = queries
  override def right: LogicalPlan = corpus
  // the node has no Catalyst expressions, so the default (expression-derived)
  // references are empty and ColumnPruning would strip the children to
  // zero columns — declare that we consume everything both children emit
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(queries.output ++ corpus.output)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(queries = l, corpus = r)
}

object KnnCandidates {
  def apply(
      queries: LogicalPlan, corpus: LogicalPlan,
      k: Int, metric: DistanceMetric): KnnCandidates =
    KnnCandidates(queries, corpus, k, metric, Seq(
      AttributeReference("query_id", LongType, nullable = false)(),
      AttributeReference("distance", DoubleType, nullable = false)(),
      AttributeReference("neighbor_id", LongType, nullable = false)()))
}

case class KnnCandidatesExec(
    queries: SparkPlan,
    corpus: SparkPlan,
    k: Int,
    metric: DistanceMetric,
    output: Seq[Attribute]) extends BinaryExecNode {
  override def left: SparkPlan = queries
  override def right: SparkPlan = corpus

  override protected def doExecute(): RDD[InternalRow] = {
    // collect + broadcast the query batch (small side by contract)
    val qRows = queries.executeCollect()
    val qArr: Array[(Long, Array[Float])] = qRows.map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray)
    }
    val bc = sparkContext.broadcast(qArr)
    val kk = k
    val m = metric
    val out = output
    corpus.execute().mapPartitions { it =>
      val qs = bc.value
      val heaps = Array.fill(qs.length)(new TopKBuffer(kk))
      it.foreach { row =>
        val id = row.getLong(0)
        val vec = row.getArray(1).toFloatArray
        var qi = 0
        while (qi < qs.length) {
          heaps(qi).insert(KnnCandidatesExec.dist(m, qs(qi)._2, vec), id)
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(out, out)
      val buf = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
        heaps(qi).sortedPairs.iterator.map { case (d, nbr) =>
          buf.update(0, qid); buf.update(1, d); buf.update(2, nbr)
          proj(buf)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(queries = l, corpus = r)
}

object KnnCandidatesExec {
  /** Full-precision Double distance, identical operation order to the
    * Catalyst distance expressions (oracle-compatible). */
  private[plans] def dist(m: DistanceMetric, a: Array[Float], b: Array[Float]): Double =
    m match {
      case DistanceMetric.Euclidean2 =>
        var acc = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
        acc
      case DistanceMetric.InnerProduct =>
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
        1.0 - acc
      case DistanceMetric.Cosine =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
}

/** Planner strategy mapping the logical node to the physical operator
  * (installed via GraftExtensions or spark.experimental.extraStrategies). */
object KnnStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnCandidates(q, c, k, m, out) =>
      KnnCandidatesExec(planLater(q), planLater(c), k, m, out) :: Nil
    case _ => Nil
  }
}

object KnnJoinPlan {
  /** Fused exact kNN through the custom operator: candidates from the
    * physical exec, final ranking via the top-k aggregate merge. Installs
    * the strategy on the session idempotently. */
  def knnFused(
      queries: DataFrame, corpus: DataFrame, k: Int,
      metric: DistanceMetric = DistanceMetric.Euclidean2): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = queries.sparkSession
    GraftSqlBridge.addStrategy(spark, KnnStrategy)
    val q = queries.select(col("query_id").cast("long"), col("embedding"))
    val c = corpus.select(col("id").cast("long"), col("embedding"))
    val node = KnnCandidates(
      GraftSqlBridge.logicalPlan(q), GraftSqlBridge.logicalPlan(c), k, metric)
    TopK.topKMerge(GraftSqlBridge.dataFrame(spark, node), k)
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineDistance, DotProduct, InnerProductDistance, SquaredL2Distance, VecSq8Encode, VecSq8Decode, VecSq8L2Sq}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the vector distance
  * expressions as SQL functions at session build time, so a deployment can
  * enable the whole engine surface with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`), the
  * engine-side analog of importing the reference's pybind module
  * (reference: python_binding/dehnswpy.cpp:38-50).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    ext.injectPlannerStrategy(_ => graft.plans.KnnStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AnnTopKRewrite)
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "vec_l2sq"),
      es => SquaredL2Distance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      es => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_ip_dist"),
      new ExpressionInfo(classOf[InnerProductDistance].getName, "vec_ip_dist"),
      es => InnerProductDistance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_cos_dist"),
      new ExpressionInfo(classOf[CosineDistance].getName, "vec_cos_dist"),
      es => CosineDistance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_sq8"),
      new ExpressionInfo(classOf[VecSq8Encode].getName, "vec_sq8"),
      es => VecSq8Encode(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("vec_sq8_decode"),
      new ExpressionInfo(classOf[VecSq8Decode].getName, "vec_sq8_decode"),
      es => VecSq8Decode(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("vec_sq8_l2sq"),
      new ExpressionInfo(classOf[VecSq8L2Sq].getName, "vec_sq8_l2sq"),
      es => VecSq8L2Sq(es(0), es(1))))
    // bounded-memory heavy hitters: heavy_hitters(item, capacity, k) —
    // the analyzer wraps a bare AggregateFunction in AggregateExpression
    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[graft.operators.HeavyHittersAgg].getName, "heavy_hitters"),
      graft.operators.HeavyHitters.sqlBuilder))
    // HyperLogLog distinct-count sketch: approx_distinct(item, p)
    ext.injectFunction((FunctionIdentifier("graft_approx_distinct"),
      new ExpressionInfo(classOf[graft.operators.HllAgg].getName, "graft_approx_distinct"),
      graft.operators.Hll.sqlBuilder))
    // fixed-grid histogram sketch: histogram_sketch(value, lo, hi, bins)
    ext.injectFunction((FunctionIdentifier("histogram_sketch"),
      new ExpressionInfo(classOf[graft.operators.HistogramSketchAgg].getName, "histogram_sketch"),
      graft.operators.HistogramSketch.sqlBuilder))
  }
}

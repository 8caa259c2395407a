package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance metric ADT — the engine-side equivalent of the reference's
  * `Distance_Type` enum (reference: source/distance.h:10-15). Unlike the
  * reference, which only dispatches Euclidean2 (distance.h:178-186), all
  * three metrics are enabled here.
  */
sealed trait DistanceMetric { def name: String }
object DistanceMetric {
  /** Squared L2 — sqrt deliberately omitted, order-preserving
    * (reference: source/distance.h:133). */
  case object Euclidean2 extends DistanceMetric { val name = "euclidean2" }
  /** 1 - dot(a, b) (reference: source/distance.h:143-151). */
  case object InnerProduct extends DistanceMetric { val name = "inner_product" }
  /** 1 - dot/(|a||b|) (reference: source/distance.h:158-170). */
  case object Cosine extends DistanceMetric { val name = "cosine" }

  val all: Seq[DistanceMetric] = Seq(Euclidean2, InnerProduct, Cosine)
}

/** Column-level vector distance functions over `ARRAY<FLOAT>` columns.
  *
  * Declarative forms built from Catalyst higher-order functions
  * (`zip_with` + `aggregate`) so they stay inside whole-stage codegen and
  * need no UDF. All arithmetic is Double: floats are widened first, the
  * fold is sequential left-to-right — deterministic and exactly
  * reproducible by any engine that folds the same element order (this is
  * what the DuckDB oracles rely on).
  *
  * Semantics mirror reference/source/distance.h D1-D3 at full precision
  * (the reference's SIMD paths truncate dims to a multiple of 16,
  * distance.h:26,52; we match mathematical semantics, not that quirk).
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.GraftSqlBridge.{column => toCol, expression => toExpr}

  /** Codegen'd dot product (primary API — see DistanceExpressions). */
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  /** Codegen'd squared L2 distance (primary API). */
  def squaredL2(a: Column, b: Column): Column =
    toCol(SquaredL2Distance(toExpr(a), toExpr(b)))

  /** Codegen'd inner-product distance 1 - dot (primary API). */
  def innerProductDistance(a: Column, b: Column): Column =
    toCol(InnerProductDistance(toExpr(a), toExpr(b)))

  /** Codegen'd cosine distance 1 - dot/(|a||b|) (primary API). */
  def cosineDistance(a: Column, b: Column): Column =
    toCol(CosineDistance(toExpr(a), toExpr(b)))

  /** Sequential-fold dot product of two float-array columns, in Double.
    * Bit-equal to [[dotProduct]]; kept as the pure-built-in reference
    * implementation the specs compare against. */
  def dotProductFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 distance, fold form (reference: source/distance.h:17-138;
    * sqrt omitted per the comment at distance.h:133 — order-preserving). */
  def squaredL2Fold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm of one vector. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Inner-product distance, fold form (reference: source/distance.h:143-151). */
  def innerProductDistanceFold(a: Column, b: Column): Column =
    lit(1.0) - dotProductFold(a, b)

  /** Cosine similarity dot/(|a||b|). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine distance, fold form (reference: source/distance.h:158-170). */
  def cosineDistanceFold(a: Column, b: Column): Column =
    lit(1.0) - dotProductFold(a, b) / (sqrt(dotProductFold(a, a)) * sqrt(dotProductFold(b, b)))

  /** JVM-side L2 normalization of one vector — the single arithmetic
    * every [[graft.index.IndexParams.normalizeForCosine]] ingest and
    * probe path shares (double accumulation left-to-right, double
    * division, round-to-float), so corpus vectors normalized on
    * executors and query vectors normalized on the driver produce
    * bit-identical floats for identical input. A zero vector has no
    * direction — it is returned unchanged (deterministic, never NaN). */
  def l2NormalizeArray(v: Array[Float]): Array[Float] = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    if (acc == 0.0) return v
    val n = Math.sqrt(acc)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i).toDouble / n).toFloat; i += 1 }
    out
  }

  /** MIPS augmented-dimension transform (corpus side):
    * x -> [x, sqrt(M² − |x|²)] with M = the calibrated corpus norm bound
    * ([[graft.index.IndexParams.mipsMaxNorm]]). Deterministic the same
    * way [[l2NormalizeArray]] is: sequential double accumulation,
    * IEEE-exact Math.sqrt, one round-to-float. A vector whose norm
    * exceeds M (beyond float-rounding slack) is rejected loudly — its
    * augmented component is undefined and would silently corrupt the
    * MIPS ranking; tiny float excess clamps to a zero component. */
  def mipsAugmentArray(v: Array[Float], maxNorm: Float): Array[Float] = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    val m2 = maxNorm.toDouble * maxNorm.toDouble
    val rest = m2 - acc
    require(rest >= -1e-6 * m2,
      f"vector norm ${Math.sqrt(acc)}%.6f exceeds the calibrated mipsMaxNorm " +
        f"$maxNorm%.6f — rebuild with a larger bound (VectorIndex.calibrateMipsNorm)")
    val out = java.util.Arrays.copyOf(v, v.length + 1)
    out(v.length) = Math.sqrt(math.max(0.0, rest)).toFloat
    out
  }

  /** Distance column for a metric — engine-side analog of
    * `get_distance_calculation_function` (reference: source/distance.h:174-187),
    * with all metrics dispatchable. */
  def distance(metric: DistanceMetric, a: Column, b: Column): Column = metric match {
    case DistanceMetric.Euclidean2   => squaredL2(a, b)
    case DistanceMetric.InnerProduct => innerProductDistance(a, b)
    case DistanceMetric.Cosine       => cosineDistance(a, b)
  }
}

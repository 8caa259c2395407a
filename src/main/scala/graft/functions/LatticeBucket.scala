package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Signed-random-projection LSH bucket over the deterministic integer
  * lattice h_i[j] = ((i*37 + j*13) mod 7) - 3 (see operators.LshKnn):
  * bit i of the result is set when the dot product with plane i is > 0.
  *
  * One pass over the vector with per-plane Double accumulators — each
  * plane's sum has exactly the same operation order as the per-plane
  * `aggregate(sequence(...))` fold (and the DuckDB oracle), so results
  * are bit-identical at numPlanes times less array traversal.
  */
case class LatticeBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if numPlanes >= 1 && numPlanes <= 31 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> and 1 <= numPlanes <= 31")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Double](numPlanes)
    var j = 0
    while (j < n) {
      val v = arr.getFloat(j).toDouble
      var i = 0
      while (i < numPlanes) {
        acc(i) += v * (((i * 37 + j * 13) % 7) - 3).toDouble
        i += 1
      }
      j += 1
    }
    var bucket = 0
    var i = 0
    while (i < numPlanes) {
      if (acc(i) > 0) bucket |= 1 << i
      i += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lattice_bucket"
}

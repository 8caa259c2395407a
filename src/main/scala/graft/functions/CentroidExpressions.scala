package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Nearest-centroid cells of a vector, as a native codegen'd expression —
  * the IVF coarse quantizer's hot loop (assignment + query routing).
  *
  * The bounded centroid table rides along inside the expression as one
  * flat dim-major float array (contiguous — the same cache-locality
  * argument as the reference's flat vector storage), so cell assignment
  * is a pure per-row computation: no join, no shuffle, no per-centroid
  * object dispatch. Returns the `nprobe` nearest centroid ids ordered by
  * (squared-L2 distance, centroid id) — the distance math is the same
  * sequential Double fold as [[SquaredL2Distance]], so results agree
  * bit-for-bit with the declarative form and the SQL oracles.
  *
  * `centroidIds` must be sorted ascending: the selection keeps the
  * earlier candidate on distance ties, which then means the smaller id —
  * reproducing ORDER BY (dist, centroid_id).
  */
case class NearestCentroids(
    child: Expression,
    centroidIds: Array[Long],
    centroidVecs: Array[Float],
    dim: Int,
    nprobe: Int) extends UnaryExpression {

  require(centroidIds.nonEmpty, "NearestCentroids needs at least one centroid")
  require(centroidVecs.length == centroidIds.length * dim,
    "flat centroid array must be numCentroids * dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val np = math.min(nprobe, centroidIds.length)
    val bd = Array.fill(np)(Double.PositiveInfinity)
    val bi = new Array[Long](np)
    val n = math.min(dim, a.numElements())
    var k = 0
    while (k < centroidIds.length) {
      val off = k * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        val t = a.getFloat(i).toDouble - centroidVecs(off + i).toDouble
        acc += t * t
        i += 1
      }
      if (acc < bd(np - 1)) {
        var j = np - 1
        while (j > 0 && acc < bd(j - 1)) {
          bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1
        }
        bd(j) = acc; bi(j) = centroidIds(k)
      }
      k += 1
    }
    new GenericArrayData(bi)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cvs = ctx.addReferenceObj("centVecs", centroidVecs, "float[]")
      val cid = ctx.addReferenceObj("centIds", centroidIds, "long[]")
      val np = math.min(nprobe, centroidIds.length)
      val bd = ctx.freshName("bestD")
      val bi = ctx.freshName("bestI")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |final double[] $bd = new double[$np];
         |final long[] $bi = new long[$np];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |final int $n = java.lang.Math.min($dim, $c.numElements());
         |for (int $k = 0; $k < ${centroidIds.length}; $k++) {
         |  final int $off = $k * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $t = (double) $c.getFloat($i) - (double) $cvs[$off + $i];
         |    $acc += $t * $t;
         |  }
         |  if ($acc < $bd[$np - 1]) {
         |    int $j = $np - 1;
         |    while ($j > 0 && $acc < $bd[$j - 1]) {
         |      $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $acc; $bi[$j] = $cid[$k];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the memory lever past SQ8: a d-dim float
  * vector (4d bytes) is split into `m` subspaces and each subvector is
  * replaced by the index of its nearest codeword, giving `m` BYTES per
  * vector (32x smaller than float32 at d=64/m=8; at 100 TB of 768-d
  * vectors, m=96 PQ codes turn a 3 KB vector into 96 bytes — the corpus'
  * candidate representation fits executor memory three orders of
  * magnitude earlier). Queries use asymmetric distance computation
  * (ADC): one m x k lookup table of exact sub-distances per query, then
  * each candidate costs m byte-indexed adds instead of d multiplies.
  *
  * Determinism contract (what the DuckDB oracle relies on): codebooks are
  * deterministically sampled corpus rows (no RNG — same rule as the IVF
  * coarse quantizer), all distances are sequential left-to-right Double
  * folds, encode ties keep the LOWEST codeword index, and the ADC sum
  * folds subspaces in ascending order — every step reproduces bit-for-bit
  * in any engine that follows the same order.
  *
  * All three expressions are whole-stage-codegen'd primitive loops; the
  * codebook rides inside the expression as one flat subspace-major float
  * array (same pattern as [[NearestCentroids]]).
  */
object PqLayout {
  /** Flat codebook offset of (subspace s, codeword j): (s*k + j)*subDim. */
  @inline def offset(s: Int, j: Int, k: Int, subDim: Int): Int = (s * k + j) * subDim

  /** Called from generated code too — keep public, Java-callable. An
    * out-of-range UnsafeArrayData read returns garbage silently, so a
    * vector whose length disagrees with m*subDim (or an ADC table that
    * disagrees with k*|codes|) must fail loudly — same strictness
    * contract as vec_l2sq / vec_sq8_l2sq / vec_hamming. */
  def dimMismatch(fn: String, got: Int, expected: Int): IllegalArgumentException =
    new IllegalArgumentException(s"$fn: input length $got, expected $expected")
}

/** ARRAY<FLOAT> -> BINARY of `m` codes (one byte each, k <= 256). */
case class PqEncode(
    child: Expression,
    codebook: Array[Float],
    m: Int, k: Int, subDim: Int) extends UnaryExpression {

  require(k >= 1 && k <= 256, s"PQ codebook size $k must be in [1, 256] for byte codes")
  require(codebook.length == m * k * subDim, "flat codebook must be m*k*subDim floats")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim)
      throw PqLayout.dimMismatch(prettyName, a.numElements(), m * subDim)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        val off = PqLayout.offset(s, j, k, subDim)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val t = a.getFloat(s * subDim + i).toDouble - codebook(off + i).toDouble
          acc += t * t
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j } // strict: ties keep lower j
        j += 1
      }
      out(s) = bestJ.toByte
      s += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |if ($c.numElements() != ${m * subDim}) {
         |  throw graft.functions.PqLayout.dimMismatch(
         |    "$prettyName", $c.numElements(), ${m * subDim});
         |}
         |final byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    final int $off = ($s * $k + $j) * $subDim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $t = (double) $c.getFloat($s * $subDim + $i) - (double) $cb[$off + $i];
         |      $acc += $t * $t;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $bestJ = $j; }
         |  }
         |  $out[$s] = (byte) $bestJ;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** ARRAY<FLOAT> query -> ARRAY<DOUBLE> ADC table of m*k exact
  * sub-distances (entry s*k + j = L2^2 of the query's subvector s against
  * codeword j). Computed once per query row, broadcast with it. */
case class PqAdcTable(
    child: Expression,
    codebook: Array[Float],
    m: Int, k: Int, subDim: Int) extends UnaryExpression {

  require(codebook.length == m * k * subDim, "flat codebook must be m*k*subDim floats")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim)
      throw PqLayout.dimMismatch(prettyName, a.numElements(), m * subDim)
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val off = PqLayout.offset(s, j, k, subDim)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val t = a.getFloat(s * subDim + i).toDouble - codebook(off + i).toDouble
          acc += t * t
          i += 1
        }
        out(s * k + j) = acc
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |if ($c.numElements() != ${m * subDim}) {
         |  throw graft.functions.PqLayout.dimMismatch(
         |    "$prettyName", $c.numElements(), ${m * subDim});
         |}
         |final double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    final int $off = ($s * $k + $j) * $subDim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $t = (double) $c.getFloat($s * $subDim + $i) - (double) $cb[$off + $i];
         |      $acc += $t * $t;
         |    }
         |    $out[$s * $k + $j] = $acc;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_table"
}

/** (ARRAY<DOUBLE> table, BINARY codes) -> DOUBLE approximate distance:
  * sum_s table[s*k + codes[s]], folded in ascending subspace order. The
  * per-candidate cost is m byte-indexed adds — independent of the
  * original dimension. */
case class PqAdcLookup(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, BINARY), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, c: Any): Any = {
    val table = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[Array[Byte]]
    if (table.numElements() != k * codes.length)
      throw PqLayout.dimMismatch(prettyName, table.numElements(), k * codes.length)
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      acc += table.getDouble(s * k + (codes(s) & 0xff))
      s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |if ($t.numElements() != $k * $c.length) {
         |  throw graft.functions.PqLayout.dimMismatch(
         |    "$prettyName", $t.numElements(), $k * $c.length);
         |}
         |double $acc = 0.0;
         |for (int $s = 0; $s < $c.length; $s++) {
         |  $acc += $t.getDouble($s * $k + ($c[$s] & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_lookup"
}

/** Column surface for the PQ codec. */
object PqFunctions {
  import GraftSqlBridge.{column => toCol, expression => toExpr}

  def encode(vec: Column, codebook: Array[Float], m: Int, k: Int, subDim: Int): Column =
    toCol(PqEncode(toExpr(vec), codebook, m, k, subDim))

  def adcTable(vec: Column, codebook: Array[Float], m: Int, k: Int, subDim: Int): Column =
    toCol(PqAdcTable(toExpr(vec), codebook, m, k, subDim))

  def adcLookup(table: Column, codes: Column, k: Int): Column =
    toCol(PqAdcLookup(toExpr(table), toExpr(codes), k))
}

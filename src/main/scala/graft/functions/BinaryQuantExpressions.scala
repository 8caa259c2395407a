package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Binary (1-bit) quantization of float vectors — the extreme end of the
  * quantization family next to SQ8 (4x, [[Sq8Expressions]]) and PQ (32x,
  * [[PqExpressions]]): ONE bit per dimension, 32x smaller than float32
  * and 8x smaller than SQ8. A 768-d vector becomes 96 bytes; Hamming
  * distance over the packed bits is a handful of XOR+popcount words per
  * candidate, making this the cheapest possible candidate-generation
  * scan at 100 TB (compose with the v22/v28 exact-rerank stage for
  * precision, exactly like the other lossy codecs).
  *
  * Determinism contract: bit i is `v[i] > 0` — a sign test, no
  * thresholds to calibrate, identical in every engine — and the Hamming
  * distance is an exact integer, so binary kNN is hash-comparable
  * against a SQL oracle that counts sign disagreements directly
  * (`(x[i] > 0) <> (y[i] > 0)`): trailing pad bits in the last byte are
  * zero on both sides and cancel in the XOR.
  *
  * Both expressions are whole-stage-codegen'd primitive loops, same
  * pattern as [[VecSq8Encode]]/[[VecSq8L2Sq]].
  */
case class VecBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  // ARRAY<FLOAT> for raw embeddings; ARRAY<DOUBLE> for centered /
  // projected inputs (e.g. `x - mean` computed in Double upstream —
  // signing the Double directly avoids a float cast that could alter
  // the test near zero)
  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val dbl = isDouble
    val out = new Array[Byte]((n + 7) >>> 3)
    var i = 0
    while (i < n) {
      val pos = if (dbl) a.getDouble(i) > 0d else a.getFloat(i) > 0f
      if (pos) out(i >>> 3) = (out(i >>> 3) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val test = if (isDouble) s"$a.getDouble($i) > 0d" else s"$a.getFloat($i) > 0f"
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[($n + 7) >>> 3];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($test) {
         |    $out[$i >>> 3] = (byte) ($out[$i >>> 3] | (1 << (7 - ($i & 7))));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "vec_bits"
}

/** Walsh-Hadamard sign projection: output j = sum_i (-1)^popcount(i & j)
  * * x_i — the orthogonal STRUCTURED ROTATION the quantization
  * literature applies before 1-bit codes when dimensions are
  * correlated. Every Hadamard row except row 0 has an equal number of
  * +1 and -1 entries, so a component shared by all dimensions cancels
  * exactly and the remaining bits spend themselves on the informative
  * directions (BinaryQuantSpec demonstrates the rescue on a corpus
  * whose dimensions share one dominant component). Output is
  * ARRAY<DOUBLE>, signed directly by [[VecBits]]; the closed form
  * `popcount(i & j)` is replayable in SQL, so projected-code queries
  * keep exact oracles. Requires a power-of-2 dimension (checked at
  * eval).
  *
  * Computed via the in-place fast Walsh-Hadamard butterfly — O(d log d)
  * per row instead of the naive O(d^2) matrix product (at 768-1024d on
  * a 100 TB ingest that is the difference between ~10K and ~1M adds per
  * row). Bit-identity with the naive sequential `popcount(i & j)` fold
  * holds exactly when NO partial sum can round: each float32 input is a
  * multiple of 2^(e_min - 23), any signed subset sum is bounded by
  * d * 2^(e_max + 1), so every intermediate (butterfly OR sequential)
  * is exact iff `(e_max - e_min) + log2(d) <= 28` over the row's
  * nonzero finite exponents — always true for normalized embeddings
  * (spread ~ a few binades) at any practical d, but NOT for adversarial
  * rows like [1e30f, 1f, ...]. The expression checks that bound per row
  * and falls back to the naive sequential fold (the v35 oracle's exact
  * arithmetic) when it fails or any element is non-finite, so the
  * oracle hash-matches on every input, not just well-scaled ones. */
case class VecHadamardProject(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VecHadamardProject.project(v.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.VecHadamardProject.project($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "vec_hadamard"
}

object VecHadamardProject {
  /** Called from generated code too — keep public, Java-callable. */
  def badDim(n: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vec_hadamard requires a power-of-2 dimension, got $n")

  /** The ONE projection implementation, shared by interpreted eval and
    * generated code (one static call per row — no boxing, no dispatch).
    * Picks the O(d log d) butterfly when the per-row exactness bound
    * holds (see the class doc: exponent spread + log2(d) <= 28 over
    * nonzero finite elements — every subset sum of float32 inputs then
    * fits a double exactly, so ANY summation order gives the same bits),
    * otherwise replays the oracle's naive sequential fold. */
  def project(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    if ((n & (n - 1)) != 0 || n == 0) throw badDim(n)
    val out = new Array[Double](n)
    var minE = Int.MaxValue
    var maxE = Int.MinValue
    var finite = true
    var i = 0
    while (i < n) {
      val f = a.getFloat(i)
      out(i) = f.toDouble
      if (f != 0.0f) {
        if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f)) finite = false
        else {
          val e = java.lang.Math.getExponent(f)
          if (e < minE) minE = e
          if (e > maxE) maxE = e
        }
      }
      i += 1
    }
    val log2n = 31 - Integer.numberOfLeadingZeros(n)
    if (finite && (minE > maxE || maxE - minE + log2n <= 28)) {
      var h = 1
      while (h < n) {
        var base = 0
        while (base < n) {
          var j = base
          while (j < base + h) {
            val u = out(j); val v = out(j + h)
            out(j) = u + v
            out(j + h) = u - v
            j += 1
          }
          base += h << 1
        }
        h <<= 1
      }
      out
    } else {
      // rounding possible: replay the sequential popcount fold exactly
      val res = new Array[Double](n)
      var j = 0
      while (j < n) {
        var acc = 0.0
        var ii = 0
        while (ii < n) {
          acc += (if (Integer.bitCount(ii & j) % 2 == 0) out(ii) else -out(ii))
          ii += 1
        }
        res(j) = acc
        j += 1
      }
      res
    }
  }
}

/** Hamming distance between two packed bit vectors: popcount of the
  * bytewise XOR, an exact INT (max = dimension). */
case class VecHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == BinaryType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BINARY arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw VecHamming.dimMismatch(x.length, y.length)
    var acc = 0
    var i = 0
    while (i < x.length) {
      acc += Integer.bitCount((x(i) ^ y(i)) & 0xff)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  throw graft.functions.VecHamming.dimMismatch($a.length, $b.length);
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_hamming"
}

object VecHamming {
  /** Called from generated code too — keep public, Java-callable. */
  def dimMismatch(a: Int, b: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vec_hamming: mismatched packed vector lengths ($a vs $b bytes)")
}

/** Column + SQL surface for the binary codec. */
object BinaryQuantFunctions {
  import GraftSqlBridge.{column => toCol, expression => toExpr}

  def bits(vec: Column): Column = toCol(VecBits(toExpr(vec)))

  def hamming(a: Column, b: Column): Column =
    toCol(VecHamming(toExpr(a), toExpr(b)))

  def hadamard(vec: Column): Column = toCol(VecHadamardProject(toExpr(vec)))

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "vec_bits", es => VecBits(es(0)))
    GraftSqlBridge.registerFunction(spark, "vec_hamming", es => VecHamming(es(0), es(1)))
    GraftSqlBridge.registerFunction(spark, "vec_hadamard", es => VecHadamardProject(es(0)))
  }
}

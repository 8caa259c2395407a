package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Scalar quantization (SQ8) of float vectors to one byte per dimension —
  * the memory lever the reference does not have (its flat float storage,
  * reference: source/dehnsw.h:70-78, costs 4 bytes/dim). At 100 TB scale a
  * 768-d float corpus is 3 KB/vector; SQ8 stores the same vector in 768
  * bytes (+8 bytes of range), a 4x cut in index memory, shuffle width and
  * scan bytes, at a bounded precision cost (max error = half a
  * quantization step per dimension).
  *
  * Determinism contract (what the DuckDB oracle relies on): the code is
  * `floor((x - lo) / (hi - lo) * 255 + 0.5)` computed in Double from the
  * float32 input, clamped to [0, 255]. Every engine that evaluates this
  * formula in IEEE Double produces the identical byte, and the quantized
  * distance is an exact integer — so quantized kNN is hash-comparable
  * across engines, unlike float arithmetic with different fold orders.
  *
  * All three expressions are whole-stage-codegen'd primitive loops (no
  * boxing, no UDF dispatch), same pattern as [[SquaredL2Distance]].
  */
abstract class Sq8CodecExpression extends TernaryExpression {
  def vec: Expression
  def lo: Expression
  def hi: Expression
  override def first: Expression = vec
  override def second: Expression = lo
  override def third: Expression = hi
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => !this.isInstanceOf[VecSq8Decode]
      case BinaryType              => this.isInstanceOf[VecSq8Decode]
      case _                       => false
    }
    if (!(vecOk && lo.dataType == DoubleType && hi.dataType == DoubleType))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (vector, DOUBLE lo, DOUBLE hi), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    // hi == lo gives scale = Infinity and silently quantizes everything to
    // byte 0; catch it at analysis time when the bounds are constants (the
    // common case — IndexParams validates its own path separately).
    (foldedBound(lo), foldedBound(hi)) match {
      case (Some(l), Some(h)) if h <= l =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires hi > lo, got lo=$l hi=$h")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def foldedBound(e: Expression): Option[Double] =
    if (e.foldable) Option(e.eval(null)).map(_.asInstanceOf[Double]) else None
}

/** ARRAY<FLOAT> -> BINARY, one byte per dimension:
  * `clamp(floor((x - lo) / (hi - lo) * 255 + 0.5), 0, 255)`. */
case class VecSq8Encode(vec: Expression, lo: Expression, hi: Expression)
    extends Sq8CodecExpression {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any, l: Any, h: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val loD = l.asInstanceOf[Double]
    val scale = 255.0 / (h.asInstanceOf[Double] - loD)
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val t = Math.floor((a.getFloat(i).toDouble - loD) * scale + 0.5)
      out(i) = Math.max(0.0, Math.min(255.0, t)).toInt.toByte
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, h) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      val scale = ctx.freshName("scale")
      s"""
         |final int $n = $a.numElements();
         |final double $scale = 255.0 / ($h - $l);
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $t = java.lang.Math.floor(((double) $a.getFloat($i) - $l) * $scale + 0.5);
         |  $out[$i] = (byte) (int) java.lang.Math.max(0.0, java.lang.Math.min(255.0, $t));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, lo = s, hi = t)
  override def prettyName: String = "vec_sq8"
}

/** BINARY -> ARRAY<FLOAT>: midpoint reconstruction `lo + q * (hi-lo)/255`
  * (max error = half a step per dimension) — the rerank input. */
case class VecSq8Decode(vec: Expression, lo: Expression, hi: Expression)
    extends Sq8CodecExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any, l: Any, h: Any): Any = {
    val a = v.asInstanceOf[Array[Byte]]
    val loD = l.asInstanceOf[Double]
    val step = (h.asInstanceOf[Double] - loD) / 255.0
    val out = new Array[Any](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = (loD + (a(i) & 0xff) * step).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, h) => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val step = ctx.freshName("step")
      s"""
         |final double $step = ($h - $l) / 255.0;
         |final float[] $out = new float[$a.length];
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $out[$i] = (float) ($l + ($a[$i] & 0xff) * $step);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, lo = s, hi = t)
  override def prettyName: String = "vec_sq8_decode"
}

/** Squared L2 in the quantized integer domain: `sum_i (a_i - b_i)^2` over
  * unsigned bytes, an EXACT BIGINT (max 64 * 255^2 per 64 dims — no
  * overflow until ~2^47 dimensions). Order-preserving proxy for the true
  * distance (monotone up to quantization error); multiply by
  * ((hi-lo)/255)^2 to recover the approximate float distance. */
case class VecSq8L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
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
      throw VecSq8L2Sq.dimMismatch(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < x.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      acc += (d * d).toLong
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.length != $b.length) {
         |  throw graft.functions.VecSq8L2Sq.dimMismatch($a.length, $b.length);
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  final int $d = ($a[$i] & 0xff) - ($b[$i] & 0xff);
         |  $acc += (long) ($d * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sq8_l2sq"
}

object VecSq8L2Sq {
  /** Called from generated code too — keep public, Java-callable. */
  def dimMismatch(a: Int, b: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vec_sq8_l2sq: mismatched quantized vector lengths ($a vs $b)")
}

/** Column + SQL surface for the SQ8 codec. */
object Sq8Functions {
  import GraftSqlBridge.{column => toCol, expression => toExpr}

  def sq8(vec: Column, lo: Double, hi: Double): Column =
    toCol(VecSq8Encode(toExpr(vec),
      org.apache.spark.sql.catalyst.expressions.Literal(lo),
      org.apache.spark.sql.catalyst.expressions.Literal(hi)))

  def sq8Decode(bin: Column, lo: Double, hi: Double): Column =
    toCol(VecSq8Decode(toExpr(bin),
      org.apache.spark.sql.catalyst.expressions.Literal(lo),
      org.apache.spark.sql.catalyst.expressions.Literal(hi)))

  def sq8L2Sq(a: Column, b: Column): Column =
    toCol(VecSq8L2Sq(toExpr(a), toExpr(b)))

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "vec_sq8", es => VecSq8Encode(es(0), es(1), es(2)))
    GraftSqlBridge.registerFunction(spark, "vec_sq8_decode", es => VecSq8Decode(es(0), es(1), es(2)))
    GraftSqlBridge.registerFunction(spark, "vec_sq8_l2sq", es => VecSq8L2Sq(es(0), es(1)))
  }
}

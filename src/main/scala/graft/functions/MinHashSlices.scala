package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` MinHash slice minima of a shingle array in ONE pass.
  *
  * Semantically identical to
  * `(0 until n).map(i => array_min(transform(shingles, s ->
  * substring(md5(s), 1 + i*5, 5))))` — one md5 per shingle, hash i = the
  * i-th 5-hex (20-bit) slice of the digest, min by byte order — which is
  * exactly what the DuckDB oracle computes. The HOF form is interpreted
  * (no codegen for lambda functions) and walks the array `n+1` times
  * materializing a digest array plus `n` slice arrays per row; this
  * expression stays inside whole-stage codegen (one static call) and
  * digests each shingle once with zero intermediate arrays.
  *
  * Returns ARRAY<STRING> of length `numHashes`, or NULL for an
  * empty/all-null shingle array (matching `array_min` of empty = NULL).
  */
case class MinHashSlices(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 6,
    "slice-derived minhash supports 1..6 hashes per md5")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(arr: Any): Any =
    MinHashSlices.slices(arr.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSlices.slices($c, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_slices"
}

object MinHashSlices {
  private val HexDigits = "0123456789abcdef".getBytes("ASCII")

  /** Static kernel the generated code calls. Null iff no non-null
    * shingles (parity with `array_min` over an empty/all-null array). */
  def slices(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    val md = MessageDigest.getInstance("MD5")
    val hex = new Array[Byte](32)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 16) {
          hex(2 * b) = HexDigits((digest(b) >> 4) & 0xF)
          hex(2 * b + 1) = HexDigits(digest(b) & 0xF)
          b += 1
        }
        var h = 0
        while (h < numHashes) {
          val off = h * 5
          val cur = mins(h)
          if (cur == null || lessAt(hex, off, cur)) {
            val s = new Array[Byte](5)
            System.arraycopy(hex, off, s, 0, 5)
            mins(h) = s
          }
          h += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new GenericArrayData(mins.map(m => UTF8String.fromBytes(m)).asInstanceOf[Array[Any]])
  }

  /** hex[off, off+5) < cur, byte-wise (ASCII hex, so byte order ==
    * lexicographic == UTF8String/DuckDB varchar order). */
  private def lessAt(hex: Array[Byte], off: Int, cur: Array[Byte]): Boolean = {
    var j = 0
    while (j < 5) {
      val d = (hex(off + j) & 0xFF) - (cur(j) & 0xFF)
      if (d != 0) return d < 0
      j += 1
    }
    false
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom filter over 64-bit hashes (Bloom, CACM 1970), double hashing per
  * Kirsch & Mitzenmacher (ESA'06): probe i tests bit (h + i*h') mod m with
  * h' derived from the input hash, so one 64-bit hash drives all k probes.
  *
  * Role in the engine: a BOUNDED-SIZE broadcastable set summary. d9's
  * contamination screen broadcasts the eval side's raw gram hashes — fine
  * for MB-scale benchmark suites, but the moment the "small" side grows
  * (a 10 GB eval suite, a blocklist of a billion hashes) the broadcast
  * dies. The Bloom bitset is fixed-size by construction (nbits chosen up
  * front), has NO false negatives (every inserted hash always tests
  * true), and its false positives only admit extra candidates into a
  * downstream exact confirm join — never wrong answers out.
  *
  * Determinism: bit positions are a pure function of the input hash, so
  * the bitset is identical for any row order / partitioning (set-bit OR is
  * commutative) and re-runs reproduce it exactly.
  */
object Bloom {

  /** splitmix64 increment — odd golden-ratio constant used to derive the
    * second hash for double hashing. */
  final val Mix = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer. Probe positions must NOT be a linear function
    * of the input's low bits: with a power-of-two bitset, any affine
    * scheme over the raw hash makes keys congruent mod nbits share ALL
    * probe positions (measured 12x the theoretical false-positive rate).
    * Mixing first spreads every input bit over the word; the first hash
    * takes the mixed low bits, the second the mixed HIGH bits — the
    * Kirsch-Mitzenmacher two-independent-hashes requirement. */
  def mix(h: Long): Long = {
    var z = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Build a bitset of `nbits` (power of two) from a single LONG-column
    * DataFrame of hashes. Executed as treeAggregate: each task ORs its
    * hashes into a local nbits/8-byte array, partial bitsets OR pairwise
    * up a tree — the driver receives one fixed-size array, never the
    * hashes (safe however many rows stream in). */
  def build(hashes: DataFrame, nbits: Int, numHashes: Int): Array[Long] = {
    require(nbits >= 64 && (nbits & (nbits - 1)) == 0, s"nbits must be a power of two >= 64, got $nbits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val mask = nbits - 1
    val k = numHashes
    hashes.select(hashes.columns.head).rdd
      .map(_.getLong(0))
      .treeAggregate(new Array[Long](nbits / 64))(
        seqOp = (bits, h) => {
          var i = 0
          val z = mix(h)
          val h2 = (z >>> 32) | 1L
          while (i < k) {
            val idx = ((z + i.toLong * h2) & mask).toInt
            bits(idx >>> 6) |= 1L << (idx & 63)
            i += 1
          }
          bits
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** Membership test column: true if `hash` MIGHT be in the set the bitset
    * was built from (guaranteed true for every inserted hash). */
  def mightContain(hash: Column, bitset: Array[Long], numHashes: Int): Column =
    GraftSqlBridge.column(
      BloomMightContainLong(GraftSqlBridge.expression(hash), bitset, numHashes))
}

/** Codegen membership probe. The bitset rides along as a plan reference
  * object (ctx.addReferenceObj — the same mechanism Spark's own runtime
  * bloom filters use), so executors receive it once with the serialized
  * plan, not per row. */
case class BloomMightContainLong(
    child: Expression, bitset: Array[Long], numHashes: Int)
  extends UnaryExpression {

  require(bitset.nonEmpty && (bitset.length & (bitset.length - 1)) == 0,
    s"bitset length must be a power of two, got ${bitset.length}")

  private val mask: Long = bitset.length.toLong * 64 - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a LONG hash argument")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val z = Bloom.mix(input.asInstanceOf[Long])
    val h2 = (z >>> 32) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((z + i.toLong * h2) & mask).toInt
      if ((bitset(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bits = ctx.addReferenceObj("bloomBits", bitset, "long[]")
    val z = ctx.freshName("z")
    val h2 = ctx.freshName("h2")
    val i = ctx.freshName("i")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long $z = graft.functions.Bloom.mix($c);
         |long $h2 = ($z >>> 32) | 1L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  int $idx = (int)(($z + (long)$i * $h2) & ${mask}L);
         |  if (($bits[$idx >>> 6] & (1L << ($idx & 63))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

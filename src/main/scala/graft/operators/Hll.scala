package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
  * AofA 2007) as a first-class mergeable aggregate — the second member of
  * the bounded-memory summaries family next to
  * [[HeavyHitters Space-Saving]].
  *
  * Bounded memory: 2^p one-byte registers per buffer (4 KiB at p=12) no
  * matter how many distinct items stream through; merge is an elementwise
  * register max, so partial per-partition sketches combine losslessly —
  * shuffle traffic is O(partitions x 2^p), never O(distinct). Standard
  * error is 1.04 / sqrt(2^p) (~1.6% at p=12). That is the operator a
  * 100 TB `COUNT(DISTINCT url)` needs: Spark's exact distinct re-shuffles
  * every distinct value; the sketch ships kilobytes.
  *
  * Determinism: the item hash is a fixed function (FNV-1a 64 finalized
  * with the splitmix64 mixer), registers are order-insensitive maxes —
  * any partitioning, any row order, same estimate. The small-range
  * regime uses linear counting (V = empty registers), per the paper.
  */
final class HllBuffer(val p: Int) extends Serializable {
  require(p >= 4 && p <= 18, s"p must be in [4, 18], got $p")
  val registers = new Array[Byte](1 << p)

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank of the first 1-bit in the remaining 64-p bits, 1-based; all
    // zeros saturates at 64 - p + 1 (nlz(0) = 64 caps via min)
    val rank = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - p + 1)
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def merge(other: HllBuffer): Unit = {
    require(other.p == p, s"cannot merge HLL sketches of different precision ($p vs ${other.p})")
    var i = 0
    while (i < registers.length) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  /** Bias-corrected cardinality estimate. */
  def estimate: Long = {
    val m = registers.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw // 64-bit hash space: the 32-bit large-range correction never applies
    math.rint(est).toLong
  }
}

/** Aggregate: approx_distinct(item, p) -> BIGINT estimated distinct count. */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  /** Items hash as strings; ImplicitCastInputTypes casts any castable
    * input and analysis fails cleanly for non-castable ones. */
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(Hll.hashUtf8(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HllBuffer): Any = buf.estimate

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buf.registers.length)
    out(0) = buf.p.toByte
    System.arraycopy(buf.registers, 0, out, 1, buf.registers.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.registers, 0, buf.registers.length)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "approx_distinct"
}

object Hll {

  /** Deterministic 64-bit string hash: FNV-1a 64 over the UTF-8 bytes,
    * finalized with the splitmix64 mixer (FNV alone is weak in the high
    * bits HLL reads the register index from). */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFFL
      h *= 0x100000001B3L
      i += 1
    }
    graft.functions.Bloom.mix(h)
  }

  /** SQL builder: approx_distinct(item, p) — p must be a foldable integer
    * literal in [4, 18]. Misuse fails at analysis with a real message. */
  def sqlBuilder(es: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> s"approx_distinct: $msg"))
    if (es.length != 2)
      fail(s"expects 2 arguments (item, p), got ${es.length}")
    val pe = es(1)
    if (!pe.foldable) fail(s"p must be a literal, got ${pe.sql}")
    val p = pe.eval() match {
      case n: Number => n.intValue()
      case other => fail(s"p must be an integer literal, got ${pe.sql}" +
        (if (other == null) " (NULL)" else s" of type ${pe.dataType.simpleString}"))
    }
    if (p < 4 || p > 18) fail(s"p must be in [4, 18], got $p")
    HllAgg(es(0), p)
  }

  /** Column form. */
  def approxDistinct(item: Column, p: Int): Column =
    GraftSqlBridge.column(
      HllAgg(GraftSqlBridge.expression(item), p).toAggregateExpression())
}

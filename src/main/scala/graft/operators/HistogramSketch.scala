package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Fixed-grid histogram sketch — the third member of the bounded-memory
  * mergeable-summaries family next to [[HeavyHitters Space-Saving]]
  * (frequency) and [[Hll HyperLogLog]] (cardinality): rank/quantile
  * queries from O(bins) state.
  *
  * The buffer is `bins` long counters over the half-open value range
  * [lo, hi); values below clamp to bin 0, values at/above `hi` clamp to
  * the top bin. Merge is elementwise ADDITION — commutative, associative,
  * and lossless, so the sketch is identical under ANY partitioning or
  * merge order (stronger than Space-Saving's capacity regime: there is no
  * approximation in the aggregation itself). The approximation lives
  * entirely in the fixed grid: a quantile answered from the histogram is
  * correct to one bin width in VALUE space. That is the right trade for
  * pipeline telemetry over bounded-domain statistics (token counts,
  * document lengths, scores in [0,1]): at 100 TB the exact percentile
  * shuffles every value; this ships `bins` longs per partition.
  *
  * Every bin count is a deterministic integer (`(v - lo) * bins / (hi -
  * lo)` in exact long arithmetic), so unlike most sketches the WHOLE
  * operator replays exactly in SQL — quantile estimates are hash-gated,
  * not error-enveloped.
  */
final class HistogramBuffer(val lo: Long, val hi: Long, val bins: Int)
    extends Serializable {
  require(bins >= 1 && bins <= (1 << 20), s"bins must be in [1, 2^20], got $bins")
  require(hi > lo, s"range must be non-empty, got [$lo, $hi)")
  // given hi > lo, a wrapped (negative) hi - lo means the true width
  // exceeds Long.MaxValue — then v - lo below could wrap too and index
  // garbage bins; reject the shape instead of mis-binning silently
  require(hi - lo > 0,
    s"range width (hi - lo) must fit in a signed 64-bit long, got [$lo, $hi)")
  private val width = hi - lo
  // (v - lo) * bins overflows Long once v - lo > Long.MaxValue / bins
  // (legal for wide ranges, e.g. hi near Long.MaxValue with bins=1024);
  // past that threshold fall back to exact wide multiplication — same
  // floor((d * bins) / width) value, no wrap into a negative index
  private val mulSafeMax = Long.MaxValue / bins
  val counts = new Array[Long](bins)

  def add(v: Long): Unit = {
    val idx =
      if (v < lo) 0
      else if (v >= hi) bins - 1
      else {
        val d = v - lo // in [0, width), no wrap: width fits in a Long
        if (d <= mulSafeMax) (d * bins / width).toInt
        else (BigInt(d) * bins / width).toInt
      }
    counts(idx) += 1
  }

  def merge(other: HistogramBuffer): Unit = {
    require(other.lo == lo && other.hi == hi && other.bins == bins,
      s"cannot merge histograms of different shape ([$lo,$hi)x$bins vs [${other.lo},${other.hi})x${other.bins})")
    var i = 0
    while (i < bins) { counts(i) += other.counts(i); i += 1 }
  }
}

/** Aggregate: histogram_sketch(value, lo, hi, bins) -> ARRAY<BIGINT> bin
  * counts. */
case class HistogramSketchAgg(
    child: Expression,
    lo: Long,
    hi: Long,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistogramBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): HistogramBuffer =
    new HistogramBuffer(lo, hi, bins)

  override def update(buf: HistogramBuffer, input: InternalRow): HistogramBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: HistogramBuffer, other: HistogramBuffer): HistogramBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HistogramBuffer): Any = new GenericArrayData(buf.counts)

  override def serialize(buf: HistogramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + 8 * buf.bins)
    bb.putLong(buf.lo).putLong(buf.hi).putInt(buf.bins)
    var i = 0
    while (i < buf.bins) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HistogramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new HistogramBuffer(bb.getLong, bb.getLong, bb.getInt)
    var i = 0
    while (i < buf.bins) { buf.counts(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "histogram_sketch"
}

object HistogramSketch {

  /** SQL builder: histogram_sketch(value, lo, hi, bins) — lo/hi/bins must
    * be foldable integer literals. Misuse fails at analysis. */
  def sqlBuilder(es: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> s"histogram_sketch: $msg"))
    if (es.length != 4)
      fail(s"expects 4 arguments (value, lo, hi, bins), got ${es.length}")
    def lit(i: Int, name: String): Long = {
      val e = es(i)
      if (!e.foldable) fail(s"$name must be a literal, got ${e.sql}")
      e.eval() match {
        case n: Number => n.longValue()
        case other => fail(s"$name must be an integer literal, got ${e.sql}" +
          (if (other == null) " (NULL)" else s" of type ${e.dataType.simpleString}"))
      }
    }
    val (lo, hi, bins) = (lit(1, "lo"), lit(2, "hi"), lit(3, "bins"))
    if (hi <= lo) fail(s"range must be non-empty, got [$lo, $hi)")
    if (hi - lo <= 0) // wrapped: true width exceeds Long.MaxValue
      fail(s"range width (hi - lo) must fit in a signed 64-bit long, got [$lo, $hi)")
    if (bins < 1 || bins > (1 << 20)) fail(s"bins must be in [1, 2^20], got $bins")
    HistogramSketchAgg(es(0), lo, hi, bins.toInt)
  }

  /** Column form. */
  def sketch(value: Column, lo: Long, hi: Long, bins: Int): Column =
    GraftSqlBridge.column(
      HistogramSketchAgg(GraftSqlBridge.expression(value), lo, hi, bins)
        .toAggregateExpression())
}

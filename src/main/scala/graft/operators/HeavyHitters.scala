package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving / Misra-Gries heavy-hitters summary (Metwally et al. 2005;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Bounded memory: at most `capacity` counters per aggregation buffer, no
  * matter how many distinct items stream through. Each kept counter carries
  * (count, err) where `err` bounds the overestimate: the item's true
  * frequency is in [count - err, count]. When the distinct-item count never
  * exceeds `capacity` (the regime every gated test runs in), err stays 0 and
  * every reported count is exact — which is what lets DuckDB's plain
  * GROUP BY serve as the oracle. At 100 TB the same plan degrades gracefully
  * to the classic eps = N/capacity approximation instead of OOMing.
  *
  * Plan shape: partial ObjectHashAggregate per partition (map-side summary,
  * <= capacity entries), one merged final buffer — shuffle traffic is
  * O(partitions x capacity), never O(distinct).
  */
final class SpaceSavingBuffer(val capacity: Int) extends Serializable {
  // item -> (count, err). Eviction scans for the min — O(capacity), but it
  // only happens once the buffer is full AND a novel item arrives, and
  // capacity is small by design.
  private[graft] val counts = new java.util.HashMap[String, Array[Long]]()

  def add(item: String, inc: Long, err: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) { cur(0) += inc; cur(1) += err; return }
    if (counts.size < capacity) { counts.put(item, Array(inc, err)); return }
    // evict the minimum-count entry (deterministic tie-break: largest key
    // string evicted first, so re-runs produce identical summaries)
    var minKey: String = null
    var minCnt = Long.MaxValue
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < minCnt || (c == minCnt && (minKey == null || e.getKey.compareTo(minKey) > 0))) {
        minCnt = c; minKey = e.getKey
      }
    }
    counts.remove(minKey)
    // Space-Saving: the newcomer inherits the evicted count as overestimate
    counts.put(item, Array(minCnt + inc, minCnt + err))
  }

  /** Mergeable-summaries merge: union counters, then keep the capacity
    * largest (count desc, key asc — deterministic). */
  def merge(other: SpaceSavingBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else counts.put(e.getKey, Array(e.getValue()(0), e.getValue()(1)))
    }
    if (counts.size > capacity) {
      val entries = sortedEntries
      var i = capacity
      while (i < entries.length) { counts.remove(entries(i)._1); i += 1 }
    }
  }

  /** (item, count, err) ordered by count desc, item asc. */
  def sortedEntries: Array[(String, Long, Long)] = {
    val arr = new Array[(String, Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long, Long), b: (String, Long, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}

/** Aggregate: heavy_hitters(item, capacity, k) -> array<struct<item, n, err>>
  * of the k most frequent items. Exact (err = 0) whenever the distinct
  * count fits in `capacity`. */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  /** Items aggregate as strings; ImplicitCastInputTypes inserts the cast
    * for any castable input (int keys etc.) and analysis fails cleanly —
    * not at execution — for non-castable ones. */
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val rows: Array[Any] = buf.sortedEntries.take(k).map { case (item, n, err) =>
      InternalRow(UTF8String.fromString(item), n, err)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    val entries = buf.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (item, n, err) =>
      // length-prefixed raw UTF-8 (writeUTF caps the encoding at 64 KiB
      // and a generally-registered aggregate can meet longer keys)
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(n); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val cnt = in.readLong(); val err = in.readLong()
      buf.add(item, cnt, err); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {

  /** SQL builder: heavy_hitters(item, capacity, k) — capacity and k must
    * be foldable integer literals. Shared by GraftExtensions and
    * session-local registration; misuse fails at analysis with a real
    * message, never as a bare cast/NPE out of function resolution. */
  def sqlBuilder(es: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> s"heavy_hitters: $msg"))
    if (es.length != 3)
      fail(s"expects 3 arguments (item, capacity, k), got ${es.length}")
    def intArg(e: Expression, name: String): Int = {
      if (!e.foldable) fail(s"$name must be a literal, got ${e.sql}")
      e.eval() match {
        case n: Number => n.intValue()
        case other => fail(s"$name must be an integer literal, got ${e.sql}" +
          (if (other == null) " (NULL)" else s" of type ${e.dataType.simpleString}"))
      }
    }
    val capacity = intArg(es(1), "capacity")
    val k = intArg(es(2), "k")
    if (capacity <= 0 || k <= 0) fail(s"capacity and k must be positive, got ($capacity, $k)")
    HeavyHittersAgg(es(0), capacity = capacity, k = k)
  }

  /** Column form. */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    GraftSqlBridge.column(
      HeavyHittersAgg(GraftSqlBridge.expression(item), capacity, k)
        .toAggregateExpression())

  /** Global top-k most frequent values of `itemCol` as
    * (rank, item, n) — rank 1-based in (n desc, item asc) order. */
  def topItems(df: DataFrame, itemCol: String, capacity: Int, k: Int): DataFrame =
    df.agg(heavyHitters(col(itemCol), capacity, k).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("e.item").as("item"),
        col("e.n").as("n"))
}

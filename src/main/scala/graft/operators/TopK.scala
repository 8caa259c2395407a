package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k smallest (distance, id) pairs, ordered
  * lexicographically by (distance, id) so ties are deterministic. A plain
  * binary max-heap over primitive-pair arrays — the hot path allocates
  * nothing per update.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  // max-heap: root is the *worst* kept candidate (largest (d, id))
  private[graft] val dists = new Array[Double](k)
  private[graft] val ids = new Array[Long](k)
  private[graft] var size = 0

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  /** Worst kept distance — the max-heap root (valid when size > 0). */
  @inline def worstDist: Double = dists(0)

  def insert(d: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      dists(i) = d; ids(i) = id; size += 1
      // sift up
      while (i > 0 && worse(dists(i), ids(i), dists((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = dists(i); dists(i) = dists(j); dists(j) = td
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m == i) continue = false else { swap(i, m); i = m }
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.dists(i), other.ids(i)); i += 1 }
  }

  /** Ascending (distance, id) drain — the reference's result order
    * (reference: python_binding/dehnswpy.cpp:28-35, ascending ids drain). */
  def sortedPairs: Array[(Double, Long)] = {
    val out = (0 until size).map(i => (dists(i), ids(i))).toArray
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** Top-k-by-distance aggregate (partial per partition, final merge) — the
  * Spark-native form of the reference's intended multi-shard query merge
  * (reference: source/dehnsw.h:572-580: per-shard bounded top-k merged and
  * truncated to k). Partial aggregation means each input partition ships at
  * most k candidates to the shuffle, so the exchange is O(groups x k), not
  * O(rows).
  *
  * Returns ARRAY<STRUCT<distance: DOUBLE, neighbor_id: BIGINT>> in
  * ascending (distance, id) order. Returns fewer than k entries when the
  * group is smaller — graceful, unlike the reference's unchecked drain
  * (reference: python_binding/dehnswpy.cpp:30-34).
  */
case class TopKByDistance(
    distChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(distChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("distance", DoubleType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = distChild.eval(input)
    val id = idChild.eval(input)
    if (d != null && id != null) {
      buf.insert(d.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sortedPairs.map { case (d, id) =>
      InternalRow(d, id)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.dists(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val d = in.readDouble(); val id = in.readLong()
      buf.insert(d, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByDistance =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByDistance =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(distChild = newChildren(0), idChild = newChildren(1))
  override def prettyName: String = "topk_by_distance"
}

object TopK {

  /** Column form: top-k (distance, id) pairs per group. */
  def topKByDistance(dist: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByDistance(
        GraftSqlBridge.expression(dist),
        GraftSqlBridge.expression(id), k).toAggregateExpression())

  /** Merge per-partition candidates (query_id, distance, neighbor_id) into
    * ranked global top-k per query — the partial/final merge step alone
    * (used by the ANN probe, where candidates come from shard searches). */
  def topKMerge(candidates: DataFrame, k: Int): DataFrame =
    candidates
      .groupBy(col("query_id"))
      .agg(topKByDistance(col("distance"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("entry.neighbor_id").as("neighbor_id"),
        col("entry.distance").as("distance"))

  /** Aggregate-based exact kNN: same contract as ExactKnn.knnJoin but with
    * map-side partial top-k — the scalable path for large query batches
    * (shuffle carries <= |queries| x partitions x k candidate rows). */
  def knnAggregate(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      metric: graft.functions.DistanceMetric = graft.functions.DistanceMetric.Euclidean2)
      : DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_embedding"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("c_embedding"))
    val scored = c
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions
          .distance(metric, col("q_embedding"), col("c_embedding")).as("distance"))
    topKMerge(scored, k)
  }
}

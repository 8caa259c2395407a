package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest for the ann-benchmarks custom binary dataset format (reference:
  * data/sift/sift.py:54-82 writes it, example/dehnsw_example.cpp:46-94
  * reads it; FIXTURES.md §2):
  *
  *   train/test:  uint64 count | uint64 dim   | float32[count*dim] row-major
  *   neighbors:   uint64 count | uint64 k     | uint64[count*k]   row-major
  *
  * Little-endian, no magic, no footer. The stride is fixed, so row i
  * lives at a computable offset — the read is DISTRIBUTED: only the
  * 16-byte header is touched on the driver; each task opens the file,
  * skips to its contiguous id range, and streams its slice (a gist-scale
  * 1M x 960d file never materializes on the driver). The path must be
  * visible to executors (shared/distributed storage in cluster mode —
  * the usual contract for file-based sources).
  *
  * HDF5 note (E6): the reference's converters start from ann-benchmarks
  * HDF5 (example/example.py:66-102) via h5py; this environment has no
  * HDF5 library (no Java HDF5 jar, no h5py), so the repo ingests the
  * binary format only — see README "Data ingestion" for the one-line
  * conversion recipe on any machine with h5py.
  */
object BinaryVectors {

  private def readHeader(path: String): (Long, Long) = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 64))
    try { (readLongLE(in), readLongLE(in)) } finally in.close()
  }

  /** Read a train/test vector file -> (id LONG, embedding ARRAY<FLOAT>).
    * Distributed fixed-stride read; `numPartitions` <= 0 means the
    * session default parallelism. */
  def readVectors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val (count, dimL) = readHeader(path)
    val dim = dimL.toInt
    val stride = dim.toLong * 4L
    val parts = partsFor(spark, count, numPartitions)
    spark.range(0L, count, 1L, parts)
      .mapPartitions { it =>
        sliceReader(it, path, headerBytes = 16L, stride) { in =>
          val buf = new Array[Byte](dim * 4)
          in.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          val vec = new Array[Float](dim)
          var i = 0
          while (i < dim) { vec(i) = bb.getFloat(); i += 1 }
          vec
        }
      }
      .toDF("id", "embedding")
  }

  /** Read a neighbors file -> exploded (query_id LONG, rank INT,
    * neighbor_id LONG) ground-truth rows (FIXTURES.md §4 shape). */
  def readNeighbors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val (count, kL) = readHeader(path)
    val k = kL.toInt
    val stride = k.toLong * 8L
    val parts = partsFor(spark, count, numPartitions)
    spark.range(0L, count, 1L, parts)
      .mapPartitions { it =>
        sliceReader(it, path, headerBytes = 16L, stride) { in =>
          val nbrs = new Array[Long](k)
          var i = 0
          while (i < k) { nbrs(i) = readLongLE(in); i += 1 }
          nbrs
        }
      }
      .flatMap { case (qid, nbrs) =>
        nbrs.iterator.zipWithIndex.map { case (n, r) => (qid, r + 1, n) }
      }
      .toDF("query_id", "rank", "neighbor_id")
  }

  /** One-time conversion job (the E6 converter direction, binary->parquet
    * instead of HDF5->binary): writes train/test/neighbors as parquet. */
  def convertToParquet(
      spark: SparkSession, trainPath: String, testPath: String,
      neighborsPath: String, outDir: String): Unit = {
    readVectors(spark, trainPath).write.mode("overwrite").parquet(s"$outDir/train")
    readVectors(spark, testPath).write.mode("overwrite").parquet(s"$outDir/test")
    readNeighbors(spark, neighborsPath).write.mode("overwrite").parquet(s"$outDir/neighbors")
  }

  private[sources] def partsFor(spark: SparkSession, count: Long, requested: Int): Int = {
    val p = if (requested > 0) requested else spark.sparkContext.defaultParallelism
    math.max(1, math.min(p.toLong, count).toInt)
  }

  /** Stream one task's contiguous id range from its file slice: skip to
    * the first id's offset, then read `stride` bytes per id sequentially.
    * The stream closes on task completion (covers early termination) —
    * range partitions are contiguous ascending, so this is one buffered
    * sequential scan per task. */
  private[sources] def sliceReader[T](
      ids: Iterator[java.lang.Long], path: String, headerBytes: Long,
      stride: Long)(readOne: DataInputStream => T): Iterator[(Long, T)] = {
    if (!ids.hasNext) return Iterator.empty
    val bit = ids.buffered
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 20))
    val ctx = TaskContext.get()
    if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => in.close())
    in.skipNBytes(headerBytes + bit.head.longValue() * stride)
    new Iterator[(Long, T)] {
      def hasNext: Boolean = {
        val h = bit.hasNext
        if (!h && ctx == null) in.close()
        h
      }
      def next(): (Long, T) = {
        val id = bit.next().longValue()
        (id, readOne(in))
      }
    }
  }

  private def readLongLE(in: DataInputStream): Long = {
    val b = new Array[Byte](8)
    val n = in.read(b)
    if (n < 8) throw new EOFException(s"truncated uint64 (got $n bytes)")
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong()
  }
}

package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest for the ann-benchmarks custom binary dataset format (reference:
  * data/sift/sift.py:54-82 writes it, example/dehnsw_example.cpp:46-94
  * reads it; FIXTURES.md §2):
  *
  *   train/test:  uint64 count | uint64 dim   | float32[count*dim] row-major
  *   neighbors:   uint64 count | uint64 k     | uint64[count*k]   row-major
  *
  * Little-endian, no magic, no footer. The loader streams the file on the
  * driver and parallelizes rows into a DataFrame (these files are a
  * one-time ingest — convert to parquet once, then scan parquet at scale).
  */
object BinaryVectors {

  /** Read a train/test vector file -> (id LONG, embedding ARRAY<FLOAT>). */
  def readVectors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 20))
    try {
      val count = readLongLE(in)
      val dim = readLongLE(in).toInt
      val rows = (0L until count).map { id =>
        val buf = new Array[Byte](dim * 4)
        in.readFully(buf)
        val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        val vec = new Array[Float](dim)
        var i = 0
        while (i < dim) { vec(i) = bb.getFloat(); i += 1 }
        (id, vec)
      }
      rows.toDF("id", "embedding")
    } finally in.close()
  }

  /** Read a neighbors file -> exploded (query_id LONG, rank INT,
    * neighbor_id LONG) ground-truth rows (FIXTURES.md §4 shape). */
  def readNeighbors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 20))
    try {
      val count = readLongLE(in)
      val k = readLongLE(in).toInt
      val rows = for {
        qid <- 0L until count
        rank <- 0 until k
      } yield (qid, rank + 1, readLongLE(in))
      rows.toDF("query_id", "rank", "neighbor_id")
    } finally in.close()
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

  private def readLongLE(in: DataInputStream): Long = {
    val b = new Array[Byte](8)
    val n = in.read(b)
    if (n < 8) throw new EOFException(s"truncated uint64 (got $n bytes)")
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong()
  }
}

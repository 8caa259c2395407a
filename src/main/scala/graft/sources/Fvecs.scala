package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest/export for the texmex vector formats (.fvecs / .bvecs / .ivecs)
  * — the layout the original sift/gist corpora ship in
  * (http://corpus-texmex.irisa.fr/; the same datasets the reference's
  * ann-benchmarks converters start from, data/sift/readme.markdown):
  * each record is
  *
  *   int32 dim (little-endian) | dim components
  *
  * with component width 4 B float32 (.fvecs), 1 B uint8 (.bvecs), or
  * 4 B int32 (.ivecs — conventionally neighbor-id lists). Every record
  * in a file carries the same dim, so after reading the FIRST header the
  * stride is fixed and the read is the same DISTRIBUTED fixed-stride
  * slice scan as [[BinaryVectors]]: only 4 bytes touch the driver, each
  * task streams its contiguous id range, and a 1M x 128d sift file never
  * materializes anywhere whole. File size must be an exact multiple of
  * the stride — a dim that varies mid-file fails loudly, not silently.
  *
  * Readers surface Spark-friendly types: fvecs/bvecs -> (id LONG,
  * embedding ARRAY<FLOAT>) (bvecs components are the uint8 values
  * 0..255 as floats — the usual treatment for byte-quantized corpora);
  * ivecs -> exploded (query_id, rank, neighbor_id) ground-truth rows,
  * matching [[BinaryVectors.readNeighbors]]'s shape (texmex neighbor
  * ids are 0-based positions; they pass through unchanged).
  */
object Fvecs {

  private def readDim(path: String): Int = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 16))
    try {
      val b = new Array[Byte](4)
      in.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt()
    } finally in.close()
  }

  private def countRecords(path: String, dim: Int, elemBytes: Int): Long = {
    val size = new java.io.File(path).length()
    val stride = 4L + dim.toLong * elemBytes
    require(dim > 0, s"$path: first record declares dim $dim")
    require(size % stride == 0,
      s"$path: size $size is not a multiple of record stride $stride " +
        s"(dim $dim x $elemBytes B + 4 B header) — mixed-dim files are not supported")
    size / stride
  }

  /** Check one record's dim header and position the stream at its
    * components; every record must repeat the file dim. */
  private def checkDim(in: DataInputStream, dim: Int): Unit = {
    val b = new Array[Byte](4)
    in.readFully(b)
    val d = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt()
    if (d != dim)
      throw new IllegalStateException(s"record dim $d != file dim $dim (corrupt or mixed-dim file)")
  }

  /** .fvecs -> (id LONG, embedding ARRAY<FLOAT>). */
  def readVectors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val dim = readDim(path)
    val count = countRecords(path, dim, 4)
    val stride = 4L + dim.toLong * 4
    val parts = BinaryVectors.partsFor(spark, count, numPartitions)
    spark.range(0L, count, 1L, parts)
      .mapPartitions { it =>
        BinaryVectors.sliceReader(it, path, headerBytes = 0L, stride) { in =>
          checkDim(in, dim)
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

  /** .bvecs -> (id LONG, embedding ARRAY<FLOAT>), components 0..255. */
  def readByteVectors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val dim = readDim(path)
    val count = countRecords(path, dim, 1)
    val stride = 4L + dim.toLong
    val parts = BinaryVectors.partsFor(spark, count, numPartitions)
    spark.range(0L, count, 1L, parts)
      .mapPartitions { it =>
        BinaryVectors.sliceReader(it, path, headerBytes = 0L, stride) { in =>
          checkDim(in, dim)
          val buf = new Array[Byte](dim)
          in.readFully(buf)
          val vec = new Array[Float](dim)
          var i = 0
          while (i < dim) { vec(i) = (buf(i) & 0xff).toFloat; i += 1 }
          vec
        }
      }
      .toDF("id", "embedding")
  }

  /** .ivecs -> exploded (query_id LONG, rank INT, neighbor_id LONG)
    * ground truth (rank 1-based, matching BinaryVectors.readNeighbors). */
  def readNeighbors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val dim = readDim(path)
    val count = countRecords(path, dim, 4)
    val stride = 4L + dim.toLong * 4
    val parts = BinaryVectors.partsFor(spark, count, numPartitions)
    spark.range(0L, count, 1L, parts)
      .mapPartitions { it =>
        BinaryVectors.sliceReader(it, path, headerBytes = 0L, stride) { in =>
          checkDim(in, dim)
          val buf = new Array[Byte](dim * 4)
          in.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          Array.fill(dim)(bb.getInt())
        }
      }
      .flatMap { case (qid, nbrs) =>
        nbrs.iterator.zipWithIndex.map { case (n, r) => (qid, r + 1, n.toLong) }
      }
      .toDF("query_id", "rank", "neighbor_id")
  }

  /** Write .fvecs (driver-side sequential — fixtures/exports; returns
    * rows written). */
  def writeVectors(path: String, rows: Iterator[Array[Float]]): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      var n = 0L
      var dim = -1
      rows.foreach { v =>
        if (dim < 0) dim = v.length
        require(v.length == dim, s"row $n has dim ${v.length}, expected $dim")
        val bb = ByteBuffer.allocate(4 + dim * 4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(dim)
        v.foreach(bb.putFloat)
        out.write(bb.array())
        n += 1
      }
      n
    } finally out.close()
  }

  /** Write .ivecs from (sorted-by-rank) neighbor lists. */
  def writeNeighbors(path: String, rows: Iterator[Array[Int]]): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      var n = 0L
      var dim = -1
      rows.foreach { v =>
        if (dim < 0) dim = v.length
        require(v.length == dim, s"row $n has k ${v.length}, expected $dim")
        val bb = ByteBuffer.allocate(4 + dim * 4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(dim)
        v.foreach(bb.putInt)
        out.write(bb.array())
        n += 1
      }
      n
    } finally out.close()
  }

  /** Write .bvecs; component values must be in [0, 255]. */
  def writeByteVectors(path: String, rows: Iterator[Array[Int]]): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      var n = 0L
      var dim = -1
      rows.foreach { v =>
        if (dim < 0) dim = v.length
        require(v.length == dim, s"row $n has dim ${v.length}, expected $dim")
        val bb = ByteBuffer.allocate(4 + dim).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(dim)
        v.foreach { x =>
          require(x >= 0 && x <= 255, s"bvecs component $x outside [0, 255]")
          bb.put(x.toByte)
        }
        out.write(bb.array())
        n += 1
      }
      n
    } finally out.close()
  }
}

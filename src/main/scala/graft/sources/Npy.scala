package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** NumPy `.npy` vector source — the other interchange format the
  * ann-benchmarks ecosystem ships embeddings in (alongside the custom
  * binary format in [[BinaryVectors]] and HDF5 in [[Hdf5]]).
  *
  * Format (NEP-1, pure header+raster):
  *   \x93NUMPY | major | minor | header_len (u16 LE v1.x / u32 LE v2.x+) |
  *   ASCII dict literal `{'descr': '<f4', 'fortran_order': False,
  *   'shape': (n, d), }` padded with spaces to a 64-byte boundary,
  *   '\n'-terminated | raw array bytes.
  *
  * Supported: 2-D C-order little-endian '<f4' / '<f8' matrices ->
  * (id LONG, embedding ARRAY<FLOAT>). Fortran order, big-endian, and
  * non-2-D shapes fail loudly — silently transposing a (d, n) file is
  * the classic npy ingestion bug.
  *
  * The read is DISTRIBUTED exactly like [[BinaryVectors]]: the driver
  * touches only the header; each task seeks to its contiguous row range
  * and streams its fixed-stride slice.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte, 'Y'.toByte)

  final case class Header(
      descr: String, itemSize: Int, rows: Long, cols: Int, dataOffset: Long)

  def readHeader(path: String): Header = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 4096))
    try {
      val magic = new Array[Byte](6)
      in.readFully(magic)
      require(magic.sameElements(Magic), s"$path: not an NPY file (bad magic)")
      val major = in.readUnsignedByte()
      in.readUnsignedByte() // minor — layout identical for our fields
      val headerLen =
        if (major == 1) {
          val b = new Array[Byte](2); in.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort() & 0xffff
        } else {
          val b = new Array[Byte](4); in.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt()
        }
      val preamble = if (major == 1) 10L else 12L
      val hdrBytes = new Array[Byte](headerLen)
      in.readFully(hdrBytes)
      val hdr = new String(hdrBytes, StandardCharsets.US_ASCII)
      val descr = ("'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(hdr)
        .getOrElse(sys.error(s"$path: no descr in npy header: $hdr"))).group(1)
      val fortran = ("'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(hdr)
        .getOrElse(sys.error(s"$path: no fortran_order in npy header"))).group(1) == "True"
      require(!fortran, s"$path: fortran_order=True unsupported (transpose on write)")
      val shape = ("'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(hdr)
        .getOrElse(sys.error(s"$path: no shape in npy header"))).group(1)
      val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
      require(dims.length == 2,
        s"$path: need a 2-D (n, d) matrix, got shape ($shape)")
      val itemSize = descr match {
        case "<f4" => 4
        case "<f8" => 8
        case other => sys.error(
          s"$path: unsupported descr '$other' (need little-endian '<f4' or '<f8')")
      }
      Header(descr, itemSize, dims(0), dims(1).toInt, preamble + headerLen)
    } finally in.close()
  }

  /** Distributed read -> (id LONG, embedding ARRAY<FLOAT>). '<f8' values
    * narrow to Float (the engine's vector element type). */
  def readVectors(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val h = readHeader(path)
    val stride = h.cols.toLong * h.itemSize
    val parts = BinaryVectors.partsFor(spark, h.rows, numPartitions)
    val (cols, itemSize, off) = (h.cols, h.itemSize, h.dataOffset)
    spark.range(0L, h.rows, 1L, parts)
      .mapPartitions { it =>
        BinaryVectors.sliceReader(it, path, headerBytes = off, stride) { in =>
          val buf = new Array[Byte](cols * itemSize)
          in.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          val vec = new Array[Float](cols)
          var i = 0
          if (itemSize == 4) while (i < cols) { vec(i) = bb.getFloat(); i += 1 }
          else while (i < cols) { vec(i) = bb.getDouble().toFloat; i += 1 }
          vec
        }
      }
      .toDF("id", "embedding")
  }

  /** Local '<f4' v1.0 writer (fixtures + the converter direction). */
  def writeVectors(path: String, rows: Iterator[Array[Float]], dim: Int): Long = {
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(path).toAbsolutePath.getParent, ".npy_", ".tmp")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 20)
    var n = 0L
    try {
      // body first (row count unknown until drained), header after
      rows.foreach { v =>
        require(v.length == dim, s"row $n has ${v.length} dims, expected $dim")
        val bb = ByteBuffer.allocate(dim * 4).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(bb.putFloat)
        out.write(bb.array())
        n += 1
      }
    } finally out.close()
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $dim), }"
    val unpadded = 10 + dict.length + 1 // preamble + dict + '\n'
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val hout = new BufferedOutputStream(new FileOutputStream(path))
    try {
      hout.write(Magic)
      hout.write(1); hout.write(0)
      val lenB = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(header.length.toShort).array()
      hout.write(lenB)
      hout.write(header.getBytes(StandardCharsets.US_ASCII))
      java.nio.file.Files.copy(tmp, hout)
    } finally {
      hout.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
    n
  }
}

package graft.sources

import java.io.{BufferedInputStream, DataInputStream, FileInputStream, IOException, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Minimal pure-JVM HDF5 reader for the ann-benchmarks dataset layout
  * (reference: `example/example.py:66-102` and `data/sift/sift.py:52-82`
  * consume these files via h5py) — closes E6's "HDF5 gap": this
  * environment has no HDF5 library, so the fixed subset of the public
  * HDF5 File Format Specification that ann-benchmarks files actually use
  * is parsed directly:
  *
  *   - superblock v0/v1 (classic, the h5py default) and v2/v3
  *   - v1 object headers (with continuation blocks) and v2 `OHDR` headers
  *   - root group links via v1 B-tree + SNOD + local heap (classic) or
  *     inline Link messages (v2 "compact" groups)
  *   - simple dataspaces (rank 1/2), fixed-point and IEEE float datatypes
  *     in either byte order, CONTIGUOUS, COMPACT or CHUNKED data layout
  *   - chunked datasets may be DEFLATE-compressed (`compression="gzip"`,
  *     the h5py default filter), LZF-compressed (`compression="lzf"`,
  *     h5py's bundled filter — [[H5Filters.lzfDecompress]]), byte-SHUFFLED
  *     (`shuffle=True`), and fletcher32-checksummed (`fletcher32=True`,
  *     verified and stripped per chunk); chunk records come from the v1
  *     chunk B-tree, and each task undoes only its own chunks' filters,
  *     in reverse pipeline order with per-chunk mask bits honored
  *
  * Fractal-heap ("dense") groups, non-atomic datatypes, and filters other
  * than deflate/lzf/shuffle/fletcher32 (szip, scaleoffset) are out of
  * scope and rejected with a clear error.
  * Metadata (a few KB, including the chunk index) is parsed on the
  * driver; bulk data reads are DISTRIBUTED, exactly like
  * [[BinaryVectors]]: contiguous layouts stream fixed-stride row slices,
  * chunked layouts partition whole chunks across tasks — a 1M x 960d
  * train matrix never materializes on the driver.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF as signed

  sealed trait Dtype { def size: Int; def littleEndian: Boolean }
  final case class FixedPoint(size: Int, littleEndian: Boolean, signed: Boolean) extends Dtype
  final case class FloatPoint(size: Int, littleEndian: Boolean) extends Dtype

  /** One stored chunk: logical (row, col) origin, file address and stored
    * (possibly compressed) byte count; `filterMask` bit i set means filter
    * i was SKIPPED for this chunk. */
  final case class ChunkRec(rowStart: Long, colStart: Long, addr: Long,
      storedSize: Long, filterMask: Int)

  /** Chunked-layout metadata: chunk shape + the flattened chunk index
    * (driver-parsed — a few bytes per chunk) and the filter pipeline as
    * HDF5 filter ids in WRITE order (1 = deflate, 2 = shuffle); reads
    * undo them in reverse. */
  final case class ChunkedMeta(chunkRows: Int, chunkCols: Int,
      filters: Seq[Int], chunks: Seq[ChunkRec]) {
    def gzip: Boolean = filters.contains(1)
    def shuffled: Boolean = filters.contains(2)
  }

  /** One dataset's metadata: `dims` is the dataspace shape; the raw data
    * live at `dataAddress` (contiguous), inline (`compact`), or in
    * indexed chunks (`chunked`). */
  final case class DatasetInfo(
      name: String, dims: Seq[Long], dtype: Dtype,
      dataAddress: Long, compact: Option[Array[Byte]],
      chunked: Option[ChunkedMeta] = None) {
    def rows: Long = dims.headOption.getOrElse(0L)
    def cols: Long = if (dims.length >= 2) dims(1) else 1L
    def rowStride: Long = cols * dtype.size
  }

  /** Parse the file's metadata and list all root-group datasets. */
  def datasets(path: String): Seq[DatasetInfo] = {
    val raf = new RandomAccessFile(path, "r")
    try new Parser(raf).rootDatasets() finally raf.close()
  }

  private def datasetOrThrow(path: String, name: String): DatasetInfo =
    datasets(path).find(_.name == name).getOrElse(throw new IOException(
      s"HDF5 dataset '$name' not found in $path (has: ${datasets(path).map(_.name).mkString(", ")})"))

  /** Read a rank-2 float dataset -> (id LONG, embedding ARRAY<FLOAT>).
    * float32 reads natively; float64 narrows to float (the engine's
    * embedding element type). Distributed fixed-stride read. */
  def readVectors(spark: SparkSession, path: String, dataset: String = "train",
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val info = datasetOrThrow(path, dataset)
    val dt = info.dtype match {
      case f: FloatPoint if f.size == 4 || f.size == 8 => f
      case other => throw new IOException(s"'$dataset' is not a float32/float64 dataset: $other")
    }
    val dim = info.cols.toInt
    val le = dt.littleEndian
    val elem = dt.size
    withRows(spark, path, info, numPartitions) { buf =>
      val bb = ByteBuffer.wrap(buf).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val vec = new Array[Float](dim)
      var i = 0
      if (elem == 4) while (i < dim) { vec(i) = bb.getFloat(); i += 1 }
      else while (i < dim) { vec(i) = bb.getDouble().toFloat; i += 1 }
      vec
    }.toDF("id", "embedding")
  }

  /** Read a rank-2 integer dataset -> exploded ground truth
    * (query_id LONG, rank INT, neighbor_id LONG) — the same shape
    * [[BinaryVectors.readNeighbors]] produces (FIXTURES.md §4).
    * ann-benchmarks neighbors are int32; int64 also accepted. */
  def readNeighbors(spark: SparkSession, path: String, dataset: String = "neighbors",
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val info = datasetOrThrow(path, dataset)
    val dt = info.dtype match {
      case f: FixedPoint if f.size == 4 || f.size == 8 => f
      case other => throw new IOException(s"'$dataset' is not an int32/int64 dataset: $other")
    }
    val k = info.cols.toInt
    val le = dt.littleEndian
    val elem = dt.size
    withRows(spark, path, info, numPartitions) { buf =>
      val bb = ByteBuffer.wrap(buf).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val nbrs = new Array[Long](k)
      var i = 0
      if (elem == 8) while (i < k) { nbrs(i) = bb.getLong(); i += 1 }
      else while (i < k) { nbrs(i) = bb.getInt().toLong; i += 1 }
      nbrs
    }.flatMap { case (qid, nbrs) =>
      nbrs.iterator.zipWithIndex.map { case (n, r) => (qid, r + 1, n) }
    }.toDF("query_id", "rank", "neighbor_id")
  }

  /** The reference's end-to-end converter direction
    * (example/example.py:66-102: h5py file -> train/test/neighbors):
    * one HDF5 file -> three parquet tables. */
  def convertToParquet(spark: SparkSession, path: String, outDir: String): Unit = {
    readVectors(spark, path, "train").write.mode("overwrite").parquet(s"$outDir/train")
    readVectors(spark, path, "test").write.mode("overwrite").parquet(s"$outDir/test")
    readNeighbors(spark, path, "neighbors").write.mode("overwrite").parquet(s"$outDir/neighbors")
  }

  /** Inflate one deflate-compressed chunk to its full (edge-padded)
    * size. Runs inside executor tasks. */
  private def inflateChunk(stored: Array[Byte], outLen: Int, addr: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(stored)
      val out = new Array[Byte](outLen)
      var off = 0
      while (off < out.length && !inf.finished()) {
        val n = inf.inflate(out, off, out.length - off)
        if (n == 0 && inf.needsInput()) throw new IOException(
          s"truncated deflate chunk at $addr")
        off += n
      }
      out
    } finally inf.end() // native zlib memory — must release on the throw path too
  }

  /** Undo the HDF5 SHUFFLE filter (id 2): the stored chunk holds all
    * first bytes of each element, then all second bytes, ... — transpose
    * back to element order. Runs inside executor tasks. */
  private def unshuffle(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var j = 0
    var src = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + j) = data(src); src += 1; i += 1 }
      j += 1
    }
    // trailing bytes short of a full element pass through unshuffled
    // (mirrors the reference C filter's leftover handling)
    if (src < data.length) System.arraycopy(data, src, out, src, data.length - src)
    out
  }

  /** Distributed row reader over a contiguous (or small compact) layout:
    * row i of an N x d matrix lives at dataAddress + i*stride. Chunked
    * layouts partition whole chunks across tasks; each task reads and
    * (if filtered) inflates only its own chunks. */
  private def withRows[T](
      spark: SparkSession, path: String, info: DatasetInfo, numPartitions: Int)(
      decode: Array[Byte] => T)(implicit enc: org.apache.spark.sql.Encoder[(Long, T)])
      : org.apache.spark.sql.Dataset[(Long, T)] = {
    val count = info.rows
    val stride = info.rowStride
    (info.chunked, info.compact) match {
      case (Some(cm), _) =>
        val chunkBytes = cm.chunkRows.toLong * cm.chunkCols * info.dtype.size
        require(chunkBytes <= Int.MaxValue, s"chunk too large: $chunkBytes bytes")
        val filters = cm.filters
        val chunkRows = cm.chunkRows
        val chunkCols = cm.chunkCols
        val cols = info.cols
        val elemSize = info.dtype.size
        val strideI = stride.toInt
        val fullRowChunks = chunkCols.toLong == cols
        val parts = math.max(1, math.min(
          if (numPartitions > 0) numPartitions
          else spark.sparkContext.defaultParallelism, cm.chunks.length))
        // per chunk: (rowId, colStart, row-fragment bytes). With full-row
        // chunks the fragment IS the row; column-split chunks emit one
        // fragment per (row, chunk) and rows reassemble below.
        val fragments = spark.sparkContext
          .parallelize(cm.chunks, parts)
          .flatMap { rec =>
            val raf = new RandomAccessFile(path, "r")
            val full = try {
              val stored = new Array[Byte](rec.storedSize.toInt)
              raf.seek(rec.addr)
              raf.readFully(stored)
              // undo the pipeline in REVERSE write order; filter mask
              // bit i set = pipeline filter i skipped for this chunk
              var data = stored
              var fi = filters.length - 1
              while (fi >= 0) {
                if ((rec.filterMask & (1 << fi)) == 0) {
                  data = filters(fi) match {
                    case 1 => inflateChunk(data, chunkBytes.toInt, rec.addr)
                    case 2 => unshuffle(data, elemSize)
                    case H5Filters.Fletcher32Id =>
                      H5Filters.fletcherVerifyStrip(data, s"chunk at ${rec.addr}")
                    case H5Filters.LzfId =>
                      H5Filters.lzfDecompress(data, chunkBytes.toInt)
                  }
                }
                fi -= 1
              }
              data
            } finally raf.close()
            // edge chunks are stored full-size; only the valid region counts
            val validRows = math.min(chunkRows.toLong, count - rec.rowStart).toInt
            val validCols = math.min(chunkCols.toLong, cols - rec.colStart).toInt
            val fragBytes = validCols * elemSize
            val rowBytes = chunkCols * elemSize
            (0 until validRows).iterator.map { r =>
              (rec.rowStart + r, rec.colStart,
                java.util.Arrays.copyOfRange(full, r * rowBytes, r * rowBytes + fragBytes))
            }
          }
        import spark.implicits._
        val rows =
          if (fullRowChunks) fragments.map { case (id, _, frag) => (id, frag) }
          else {
            // reassemble each row from its column fragments: one shuffle
            // of row-sized data keyed by row id, fragments spliced by
            // their column offset (missing fragments would leave zeroed
            // elements — impossible for a well-formed chunk index)
            fragments
              .map { case (id, colStart, frag) => (id, (colStart, frag)) }
              .groupByKey(parts)
              .map { case (id, frags) =>
                val buf = new Array[Byte](strideI)
                frags.foreach { case (colStart, frag) =>
                  System.arraycopy(frag, 0, buf, (colStart * elemSize).toInt, frag.length)
                }
                (id, buf)
              }
          }
        spark.createDataset(rows)(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
          .map { case (i, buf) => (i, decode(buf)) }
      case (None, Some(bytes)) => // tiny inline block: decode on the driver, parallelize
        val rows = (0L until count).map { i =>
          (i, decode(java.util.Arrays.copyOfRange(bytes, (i * stride).toInt, ((i + 1) * stride).toInt)))
        }
        spark.createDataset(rows)
      case (None, None) =>
        val dataAddr = info.dataAddress
        val parts = BinaryVectors.partsFor(spark, count, numPartitions)
        spark.range(0L, count, 1L, parts)
          .mapPartitions { it =>
            BinaryVectors.sliceReader(it, path, headerBytes = dataAddr, stride) { in =>
              val buf = new Array[Byte](stride.toInt)
              in.readFully(buf)
              decode(buf)
            }
          }
    }
  }

  private sealed trait LayoutKind
  private final case class LayoutContiguous(addr: Long) extends LayoutKind
  private final case class LayoutCompact(bytes: Array[Byte]) extends LayoutKind
  /** `chunkDims` = per-dimension chunk sizes plus the trailing element
    * size the layout message stores. */
  private final case class LayoutChunked(btreeAddr: Long, chunkDims: Seq[Int]) extends LayoutKind

  // ------------------------------------------------------------------ parser

  /** Driver-side metadata parser over the file-format structures listed in
    * the object Scaladoc. All multi-byte metadata fields are little-endian
    * (per the HDF5 spec); "size of offsets/lengths" must be 8. */
  private final class Parser(raf: RandomAccessFile) {

    private def readAt(pos: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      raf.seek(pos)
      raf.readFully(b)
      b
    }
    private def bb(pos: Long, n: Int): ByteBuffer =
      ByteBuffer.wrap(readAt(pos, n)).order(ByteOrder.LITTLE_ENDIAN)

    private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

    private def findSuperblock(): Long = {
      var off = 0L
      while (off < raf.length()) {
        if (java.util.Arrays.equals(readAt(off, 8), Signature)) return off
        off = if (off == 0) 512 else off * 2
      }
      throw new IOException("not an HDF5 file (no superblock signature)")
    }

    def rootDatasets(): Seq[DatasetInfo] = {
      val sbOff = findSuperblock()
      val ver = bb(sbOff + 8, 1).get() & 0xFF
      val rootHeaderAddr = ver match {
        case 0 | 1 =>
          // classic superblock: fsver(1) rgver(1) res(1) shver(1) sizeoff(1) sizelen(1) res(1)
          val sizeOffsets = bb(sbOff + 13, 1).get() & 0xFF
          val sizeLengths = bb(sbOff + 14, 1).get() & 0xFF
          require(sizeOffsets == 8 && sizeLengths == 8,
            s"unsupported HDF5 offset/length sizes: $sizeOffsets/$sizeLengths (only 8 supported)")
          val fixed = if (ver == 0) 24L else 28L // v1 adds indexed-storage k + reserved(2)
          // base(8) fs(8) eof(8) dib(8) then root symbol table entry
          val steAddr = sbOff + fixed + 32
          bb(steAddr + 8, 8).getLong()
        case 2 | 3 =>
          val b = bb(sbOff + 9, 3)
          require((b.get(0) & 0xFF) == 8 && (b.get(1) & 0xFF) == 8,
            "unsupported HDF5 offset/length sizes (only 8 supported)")
          bb(sbOff + 12 + 24, 8).getLong() // base, ext, eof, then root OHDR addr
        case v => throw new IOException(s"unsupported HDF5 superblock version $v")
      }
      val rootMsgs = objectHeader(rootHeaderAddr)
      val links = groupLinks(rootMsgs)
      links.map { case (name, addr) => dataset(name, objectHeader(addr)) }
    }

    /** (type, body) for every message in the header at `addr`, following
      * continuations; handles v1 headers and v2 `OHDR`. */
    private def objectHeader(addr: Long): Seq[(Int, Array[Byte])] = {
      if (new String(readAt(addr, 4), "ASCII") == "OHDR") objectHeaderV2(addr)
      else objectHeaderV1(addr)
    }

    private def objectHeaderV1(addr: Long): Seq[(Int, Array[Byte])] = {
      val head = bb(addr, 16)
      val version = head.get(0) & 0xFF
      if (version != 1) throw new IOException(s"unsupported object header version $version at $addr")
      val nMsgs = head.getShort(2) & 0xFFFF
      val chunk0 = head.getInt(8).toLong & 0xFFFFFFFFL
      val msgs = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      val regions = mutable.Queue[(Long, Long)]((addr + 16, chunk0))
      while (regions.nonEmpty && msgs.length < nMsgs) {
        val (start, len) = regions.dequeue()
        var pos = start
        val end = start + len
        while (pos + 8 <= end && msgs.length < nMsgs) {
          val mh = bb(pos, 8)
          val mtype = mh.getShort(0) & 0xFFFF
          val msize = mh.getShort(2) & 0xFFFF
          val body = readAt(pos + 8, msize)
          if (mtype == 0x0010) { // continuation: offset(8), length(8)
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            regions.enqueue((cb.getLong(0), cb.getLong(8)))
          } else if (mtype != 0) msgs += ((mtype, body))
          pos += 8 + msize
        }
      }
      msgs.toSeq
    }

    private def objectHeaderV2(addr: Long): Seq[(Int, Array[Byte])] = {
      val flags = bb(addr + 5, 1).get() & 0xFF
      var pos = addr + 6
      if ((flags & 0x20) != 0) pos += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) pos += 4 // max compact / min dense attributes
      val szWidth = 1 << (flags & 3)
      val chunk0 = bb(pos, szWidth) match {
        case b if szWidth == 1 => b.get(0).toLong & 0xFF
        case b if szWidth == 2 => b.getShort(0).toLong & 0xFFFF
        case b if szWidth == 4 => b.getInt(0).toLong & 0xFFFFFFFFL
        case b => b.getLong(0)
      }
      pos += szWidth
      val orderTracked = (flags & 0x04) != 0
      val msgs = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      val regions = mutable.Queue[(Long, Long)]((pos, chunk0))
      while (regions.nonEmpty) {
        val (start, len) = regions.dequeue()
        var p = start
        val end = start + len
        val hdrSz = 4 + (if (orderTracked) 2 else 0)
        while (p + hdrSz <= end) {
          val mh = bb(p, hdrSz)
          val mtype = mh.get(0) & 0xFF
          val msize = mh.getShort(1) & 0xFFFF
          val body = readAt(p + hdrSz, msize)
          if (mtype == 0x10) {
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            // continuation block: "OCHK" + messages + checksum(4)
            regions.enqueue((cb.getLong(0) + 4, cb.getLong(8) - 8))
          } else if (mtype != 0) msgs += ((mtype, body))
          p += hdrSz + msize
        }
      }
      msgs.toSeq
    }

    /** Root-group children as (name, object header address): symbol-table
      * message (classic) or inline Link messages (v2 compact groups). */
    private def groupLinks(msgs: Seq[(Int, Array[Byte])]): Seq[(String, Long)] = {
      msgs.find(_._1 == 0x0011) match {
        case Some((_, body)) =>
          val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          val btreeAddr = b.getLong(0)
          val heapDataAddr = {
            val h = bb(b.getLong(8), 32)
            require(new String(h.array(), 0, 4, "ASCII") == "HEAP", "bad local heap signature")
            h.getLong(24)
          }
          btreeEntries(btreeAddr).map { case (nameOff, ohAddr) =>
            (heapString(heapDataAddr + nameOff), ohAddr)
          }
        case None =>
          val links = msgs.filter(_._1 == 0x0006).map { case (_, body) => linkMessage(body) }
          if (links.nonEmpty) links.collect { case Some(l) => l }
          else {
            // a Link Info message pointing at a fractal heap = "dense" group
            if (msgs.exists(_._1 == 0x0002))
              throw new IOException("dense (fractal-heap) HDF5 groups are not supported")
            Seq.empty
          }
      }
    }

    private def linkMessage(body: Array[Byte]): Option[(String, Long)] = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      var p = 0
      val version = b.get(p) & 0xFF; p += 1
      require(version == 1, s"unsupported link message version $version")
      val flags = b.get(p) & 0xFF; p += 1
      var linkType = 0
      if ((flags & 0x08) != 0) { linkType = b.get(p) & 0xFF; p += 1 }
      if ((flags & 0x04) != 0) p += 8 // creation order
      if ((flags & 0x10) != 0) p += 1 // charset
      val lenSz = 1 << (flags & 3)
      val nameLen = lenSz match {
        case 1 => b.get(p).toInt & 0xFF
        case 2 => b.getShort(p).toInt & 0xFFFF
        case 4 => b.getInt(p)
        case _ => b.getLong(p).toInt
      }
      p += lenSz
      val name = new String(body, p, nameLen, "UTF-8"); p += nameLen
      if (linkType == 0) Some((name, b.getLong(p))) else None // hard links only
    }

    /** All (heap name offset, object header address) pairs under a v1
      * group B-tree, recursing through internal nodes and SNOD leaves. */
    private def btreeEntries(btreeAddr: Long): Seq[(Long, Long)] = {
      val head = bb(btreeAddr, 24)
      require(new String(head.array(), 0, 4, "ASCII") == "TREE", "bad B-tree signature")
      val nodeType = head.get(4) & 0xFF
      require(nodeType == 0, s"unexpected B-tree node type $nodeType (want group node)")
      val level = head.get(5) & 0xFF
      val entries = head.getShort(6) & 0xFFFF
      // keys and children alternate: key0 child0 key1 child1 ... childN-1 keyN
      val kc = bb(btreeAddr + 24, (2 * entries + 1) * 8)
      val children = (0 until entries).map(i => kc.getLong((2 * i + 1) * 8))
      if (level > 0) children.flatMap(btreeEntries)
      else children.flatMap(snodEntries)
    }

    private def snodEntries(snodAddr: Long): Seq[(Long, Long)] = {
      val head = bb(snodAddr, 8)
      require(new String(head.array(), 0, 4, "ASCII") == "SNOD", "bad SNOD signature")
      val n = head.getShort(6) & 0xFFFF
      val body = bb(snodAddr + 8, n * 40)
      (0 until n).map { i =>
        (body.getLong(i * 40), body.getLong(i * 40 + 8))
      }
    }

    private def heapString(addr: Long): String = {
      val sb = new StringBuilder
      var pos = addr
      var done = false
      while (!done) {
        val chunk = readAt(pos, 16)
        val nul = chunk.indexOf(0.toByte)
        if (nul >= 0) { sb.append(new String(chunk, 0, nul, "UTF-8")); done = true }
        else { sb.append(new String(chunk, "UTF-8")); pos += 16 }
      }
      sb.toString
    }

    private def dataset(name: String, msgs: Seq[(Int, Array[Byte])]): DatasetInfo = {
      val dims = msgs.find(_._1 == 0x0001).map(m => dataspace(m._2)).getOrElse(
        throw new IOException(s"dataset '$name': no dataspace message"))
      val dtype = msgs.find(_._1 == 0x0003).map(m => datatype(m._2, name)).getOrElse(
        throw new IOException(s"dataset '$name': no datatype message"))
      layout(msgs.find(_._1 == 0x0008).map(_._2).getOrElse(
        throw new IOException(s"dataset '$name': no layout message")), name) match {
        case LayoutContiguous(addr) => DatasetInfo(name, dims, dtype, addr, None)
        case LayoutCompact(bytes) => DatasetInfo(name, dims, dtype, Undef, Some(bytes))
        case LayoutChunked(btreeAddr, chunkDims) =>
          // chunk dims include a trailing element-size dimension
          val rank = dims.length
          require(chunkDims.length == rank + 1,
            s"dataset '$name': chunk rank ${chunkDims.length - 1} != dataspace rank $rank")
          val filters = msgs.find(_._1 == 0x000B)
            .map(m => filterPipelineIds(m._2, name)).getOrElse(Seq.empty)
          val chunks = chunkBtreeEntries(btreeAddr, rank + 1)
          val (cr, cc) =
            if (rank == 1) (chunkDims(0), 1)
            else (chunkDims(0), chunkDims(1))
          DatasetInfo(name, dims, dtype, Undef, None,
            Some(ChunkedMeta(cr, cc, filters, chunks)))
      }
    }

    /** Filter ids in pipeline (write) order, restricted to the filters
      * this reader can undo (1 = deflate, 2 = shuffle); anything else
      * rejects with a clear error. */
    private def filterPipelineIds(body: Array[Byte], name: String): Seq[Int] = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val version = b.get(0) & 0xFF
      val nFilters = b.get(1) & 0xFF
      var p = version match {
        case 1 => 8 // version, nfilters, reserved(6)
        case 2 => 2
        case v => throw new IOException(s"dataset '$name': unsupported filter pipeline version $v")
      }
      val ids = Seq.newBuilder[Int]
      for (_ <- 0 until nFilters) {
        val id = b.getShort(p) & 0xFFFF
        // v1 always carries a name-length field; v2 omits it for id < 256
        val hasNameLen = version == 1 || id >= 256
        val nameLen = if (hasNameLen) b.getShort(p + 2) & 0xFFFF else 0
        var q = p + (if (hasNameLen) 4 else 2)
        q += 2 // flags
        val nCd = b.getShort(q) & 0xFFFF; q += 2
        val paddedName = if (version == 1) (nameLen + 7) & ~7 else nameLen
        q += paddedName
        q += 4 * nCd
        if (version == 1 && nCd % 2 == 1) q += 4 // v1 pads client data to 8
        id match {
          case 1 | 2 | H5Filters.Fletcher32Id | H5Filters.LzfId => ids += id
          case other => throw new IOException(
            s"dataset '$name': unsupported HDF5 filter id $other " +
              "(deflate/gzip, shuffle, fletcher32, and lzf are supported — rewrite without szip/scaleoffset)")
        }
        p = q
      }
      ids.result()
    }

    /** All chunk records under a v1 chunk B-tree (node type 1). Keys carry
      * (stored size, filter mask, chunk offsets x ndims); children are
      * chunk data addresses at level 0 and subtree addresses above. */
    private def chunkBtreeEntries(btreeAddr: Long, ndims: Int): Seq[ChunkRec] = {
      if (btreeAddr == Undef) return Seq.empty
      val keySize = 8 + 8 * ndims
      val head = bb(btreeAddr, 24)
      require(new String(head.array(), 0, 4, "ASCII") == "TREE", "bad chunk B-tree signature")
      val nodeType = head.get(4) & 0xFF
      require(nodeType == 1, s"unexpected B-tree node type $nodeType (want chunk node)")
      val level = head.get(5) & 0xFF
      val entries = head.getShort(6) & 0xFFFF
      val body = bb(btreeAddr + 24, entries * (keySize + 8) + keySize)
      (0 until entries).flatMap { i =>
        val kp = i * (keySize + 8)
        val child = body.getLong(kp + keySize)
        if (level > 0) chunkBtreeEntries(child, ndims)
        else {
          val storedSize = body.getInt(kp).toLong & 0xFFFFFFFFL
          val mask = body.getInt(kp + 4)
          val rowStart = body.getLong(kp + 8)
          val colStart = if (ndims >= 3) body.getLong(kp + 16) else 0L
          Seq(ChunkRec(rowStart, colStart, child, storedSize, mask))
        }
      }
    }

    private def dataspace(body: Array[Byte]): Seq[Long] = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val version = b.get(0) & 0xFF
      val rank = b.get(1) & 0xFF
      val dimsStart = version match {
        case 1 => 8 // version, rank, flags, reserved(5)
        case 2 => 4 // version, rank, flags, type
        case v => throw new IOException(s"unsupported dataspace version $v")
      }
      require(rank >= 1 && rank <= 2, s"only rank-1/2 dataspaces supported (got $rank)")
      (0 until rank).map(i => b.getLong(dimsStart + i * 8))
    }

    private def datatype(body: Array[Byte], name: String): Dtype = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val classVer = b.get(0) & 0xFF
      val cls = classVer & 0x0F
      val bits0 = b.get(1) & 0xFF
      val size = b.getInt(4)
      val le = (bits0 & 1) == 0
      cls match {
        case 0 => FixedPoint(size, le, signed = (bits0 & 8) != 0)
        case 1 => FloatPoint(size, le)
        case c => throw new IOException(
          s"dataset '$name': unsupported datatype class $c (fixed/float only)")
      }
    }

    private def layout(body: Array[Byte], name: String): LayoutKind = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val version = b.get(0) & 0xFF
      version match {
        case 3 =>
          val cls = b.get(1) & 0xFF
          cls match {
            case 0 => // compact: size(2) + data
              val n = b.getShort(2) & 0xFFFF
              LayoutCompact(java.util.Arrays.copyOfRange(body, 4, 4 + n))
            case 1 => LayoutContiguous(b.getLong(2)) // address(8), size(8)
            case 2 =>
              // dimensionality(1, = rank+1), btree address(8), dims x 4
              val ndims = b.get(2) & 0xFF
              val btreeAddr = b.getLong(3)
              val dims = (0 until ndims - 1).map(i => b.getInt(11 + i * 4))
              // the trailing dim is the element size; keep shape + size
              LayoutChunked(btreeAddr, dims :+ b.getInt(11 + (ndims - 1) * 4))
            case c => throw new IOException(s"dataset '$name': unknown layout class $c")
          }
        case 1 | 2 =>
          val rank = b.get(1) & 0xFF
          val cls = b.get(2) & 0xFF
          require(cls == 1, s"dataset '$name': only contiguous v1/v2 layouts supported")
          LayoutContiguous(b.getLong(8)) // version, rank, class, reserved(5), address
        case v => throw new IOException(s"dataset '$name': unsupported layout version $v")
      }
    }
  }
}

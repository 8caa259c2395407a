package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal HDF5 writer for the same fixed subset [[Hdf5]] reads: root-group
  * datasets of rank-2 float32 / int32 / int64 matrices with contiguous
  * layout. Two container flavors:
  *
  *   - classic (superblock v0, v1 object headers, B-tree + SNOD + local
  *     heap root group) — byte-compatible with what default h5py emits
  *     structurally, and
  *   - modern (superblock v2, `OHDR` v2 headers with inline Link messages,
  *     Jenkins lookup3 checksums) — the `libver='latest'` shape.
  *
  * This is the export/fixture half of the E6 converter story (the
  * reference consumes ann-benchmarks HDF5 via h5py,
  * `example/example.py:66-102`): it lets the repo build self-contained
  * round-trip tests with no HDF5 library in the environment, and gives
  * users a path to EMIT ann-benchmarks-shaped files from engine results.
  * Driver-side by design — fixtures and result exports are small; bulk
  * vector data interchange at scale should use parquet.
  */
object Hdf5Writer {

  sealed trait Matrix { def rows: Int; def cols: Int }
  final case class FloatMatrix(values: Array[Array[Float]]) extends Matrix {
    def rows: Int = values.length
    def cols: Int = if (values.isEmpty) 0 else values(0).length
  }
  final case class IntMatrix(values: Array[Array[Int]]) extends Matrix {
    def rows: Int = values.length
    def cols: Int = if (values.isEmpty) 0 else values(0).length
  }
  final case class LongMatrix(values: Array[Array[Long]]) extends Matrix {
    def rows: Int = values.length
    def cols: Int = if (values.isEmpty) 0 else values(0).length
  }

  /** Write `datasets` (name -> matrix) as a single HDF5 file. */
  def write(path: String, datasets: Seq[(String, Matrix)], modern: Boolean = false): Unit = {
    val sorted = datasets.sortBy(_._1) // symbol tables require name order
    val bytes = if (modern) writeModern(sorted) else writeClassic(sorted)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try out.write(bytes) finally out.close()
  }

  /** ann-benchmarks layout: train/test float32, neighbors int32. */
  def writeAnnBenchmarks(path: String, train: Array[Array[Float]],
      test: Array[Array[Float]], neighbors: Array[Array[Int]],
      modern: Boolean = false): Unit =
    write(path, Seq(
      "train" -> FloatMatrix(train),
      "test" -> FloatMatrix(test),
      "neighbors" -> IntMatrix(neighbors)), modern)

  private val Undef = -1L
  private def pad8(n: Int): Int = (n + 7) & ~7

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  // -------------------------------------------------------------- datatypes

  private def datatypeBody(m: Matrix): Array[Byte] = m match {
    case _: FloatMatrix =>
      val b = le(20)
      b.put(0x11.toByte) // version 1, class 1 (float)
      b.put(0x20.toByte) // LE, IEEE implied-msb normalization
      b.put(0x1F.toByte) // sign bit position 31
      b.put(0.toByte)
      b.putInt(4) // size
      b.putShort(0) // bit offset
      b.putShort(32) // precision
      b.put(23.toByte) // exponent location
      b.put(8.toByte) // exponent size
      b.put(0.toByte) // mantissa location
      b.put(23.toByte) // mantissa size
      b.putInt(127) // exponent bias
      b.array()
    case m2 =>
      val size = if (m2.isInstanceOf[IntMatrix]) 4 else 8
      val b = le(12)
      b.put(0x10.toByte) // version 1, class 0 (fixed-point)
      b.put(0x08.toByte) // LE, signed
      b.put(0.toByte); b.put(0.toByte)
      b.putInt(size)
      b.putShort(0) // bit offset
      b.putShort((size * 8).toShort) // precision
      b.array()
  }

  private def elemSize(m: Matrix): Int = m match {
    case _: FloatMatrix => 4
    case _: IntMatrix => 4
    case _: LongMatrix => 8
  }

  private def rawData(m: Matrix): Array[Byte] = {
    val b = le(m.rows * m.cols * elemSize(m))
    m match {
      case FloatMatrix(v) => v.foreach(row => row.foreach(b.putFloat))
      case IntMatrix(v) => v.foreach(row => row.foreach(b.putInt))
      case LongMatrix(v) => v.foreach(row => row.foreach(b.putLong))
    }
    b.array()
  }

  private def dataspaceV1Body(m: Matrix): Array[Byte] = {
    val b = le(24)
    b.put(1.toByte) // version
    b.put(2.toByte) // rank
    b.put(0.toByte) // flags (no max dims)
    b.put(0.toByte); b.putInt(0) // reserved
    b.putLong(m.rows.toLong)
    b.putLong(m.cols.toLong)
    b.array()
  }

  private def layoutBody(dataAddr: Long, dataLen: Long): Array[Byte] = {
    val b = le(18)
    b.put(3.toByte) // layout version 3
    b.put(1.toByte) // contiguous
    b.putLong(dataAddr)
    b.putLong(dataLen)
    b.array()
  }

  // -------------------------------------------------------------- classic v0

  private def v1Message(mtype: Int, body: Array[Byte]): Array[Byte] = {
    val padded = pad8(body.length)
    val b = le(8 + padded)
    b.putShort(mtype.toShort)
    b.putShort(padded.toShort)
    b.put(0.toByte) // flags
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.put(body)
    b.array()
  }

  private def v1ObjectHeader(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val total = msgs.map(_.length).sum
    val b = le(16 + total)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(msgs.length.toShort)
    b.putInt(1) // reference count
    b.putInt(total) // size of chunk 0
    b.putInt(0) // pad to 8
    msgs.foreach(b.put)
    b.array()
  }

  private def writeClassic(datasets: Seq[(String, Matrix)]): Array[Byte] = {
    val K = 4 // group leaf k (btree/SNOD allocated for 2K entries)
    require(datasets.length <= 2 * K, s"classic writer supports <= ${2 * K} datasets")

    // local heap data: offset 0 = "" (root STE name), then dataset names
    var heapOff = 8
    val nameOffsets = datasets.map { case (name, _) =>
      val off = heapOff
      heapOff += pad8(name.length + 1)
      (name, off.toLong)
    }.toMap
    val heapDataSize = pad8(heapOff)

    // dataset object headers (layout address patched in below)
    def dsHeader(m: Matrix, dataAddr: Long): Array[Byte] = v1ObjectHeader(Seq(
      v1Message(0x0001, dataspaceV1Body(m)),
      v1Message(0x0003, datatypeBody(m)),
      v1Message(0x0008, layoutBody(dataAddr, m.rows.toLong * m.cols * elemSize(m)))))

    // --- address layout (all 8-aligned by construction)
    val superblockAddr = 0L
    val rootHeaderAddr = 96L
    val rootHeaderLen = 16 + 8 + 16 // one symbol-table message
    val heapHdrAddr = rootHeaderAddr + rootHeaderLen
    val heapDataAddr = heapHdrAddr + 32
    val btreeAddr = heapDataAddr + heapDataSize
    val btreeLen = 24 + (2 * K + 1) * 8 + 2 * K * 8
    val snodAddr = btreeAddr + btreeLen
    val snodLen = 8 + 2 * K * 40
    var cursor = snodAddr + snodLen
    val headerAddrs = datasets.map { case (name, m) =>
      val a = cursor
      cursor += dsHeader(m, 0L).length
      (name, a)
    }.toMap
    val dataAddrs = datasets.map { case (name, m) =>
      val a = cursor
      cursor += pad8(m.rows * m.cols * elemSize(m))
      (name, a)
    }.toMap
    val eof = cursor

    val out = le(eof.toInt)

    // superblock v0
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(0.toByte) // superblock version
    out.put(0.toByte) // free space version
    out.put(0.toByte) // root group symbol table version
    out.put(0.toByte)
    out.put(0.toByte) // shared header message version
    out.put(8.toByte); out.put(8.toByte) // size of offsets / lengths
    out.put(0.toByte)
    out.putShort(K.toShort) // group leaf node k
    out.putShort(16.toShort) // group internal node k
    out.putInt(0) // consistency flags
    out.putLong(0L) // base address
    out.putLong(Undef) // free-space info
    out.putLong(eof)
    out.putLong(Undef) // driver info block
    // root symbol table entry (cache type 1: scratch = btree + heap)
    out.putLong(0L) // link name offset ("")
    out.putLong(rootHeaderAddr)
    out.putInt(1); out.putInt(0)
    out.putLong(btreeAddr); out.putLong(heapHdrAddr)

    // root object header: symbol table message
    val stBody = { val b = le(16); b.putLong(btreeAddr); b.putLong(heapHdrAddr); b.array() }
    out.put(v1ObjectHeader(Seq(v1Message(0x0011, stBody))))

    // local heap
    out.put("HEAP".getBytes("ASCII"))
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.putLong(heapDataSize.toLong)
    out.putLong(1L) // free list: none
    out.putLong(heapDataAddr)
    val heapData = new Array[Byte](heapDataSize)
    nameOffsets.foreach { case (name, off) =>
      System.arraycopy(name.getBytes("UTF-8"), 0, heapData, off.toInt, name.length)
    }
    out.put(heapData)

    // B-tree: one leaf-level node pointing at the single SNOD
    out.put("TREE".getBytes("ASCII"))
    out.put(0.toByte) // node type: group
    out.put(0.toByte) // level
    out.putShort(1.toShort) // entries used
    out.putLong(Undef); out.putLong(Undef) // siblings
    out.putLong(0L) // key 0: ""
    out.putLong(snodAddr) // child 0
    out.putLong(nameOffsets(datasets.last._1)) // key 1: greatest name
    // remaining allocated key/child slots stay zero-filled

    // SNOD
    out.position(snodAddr.toInt)
    out.put("SNOD".getBytes("ASCII"))
    out.put(1.toByte); out.put(0.toByte)
    out.putShort(datasets.length.toShort)
    datasets.foreach { case (name, _) =>
      out.putLong(nameOffsets(name))
      out.putLong(headerAddrs(name))
      out.putInt(0); out.putInt(0)
      out.putLong(0L); out.putLong(0L) // scratch
    }

    // dataset headers + raw data
    datasets.foreach { case (name, m) =>
      out.position(headerAddrs(name).toInt)
      out.put(dsHeader(m, dataAddrs(name)))
    }
    datasets.foreach { case (name, m) =>
      out.position(dataAddrs(name).toInt)
      out.put(rawData(m))
    }
    out.array()
  }

  // ------------------------------------------------------- chunked (+gzip)

  /** Write `datasets` with CHUNKED layout — `chunkRows` rows per chunk,
    * and (when `chunkCols` > 0) chunks that also SPLIT each row into
    * column slices — deflate-compressed when `gzip`, LZF-compressed when
    * `lzf` ([[H5Filters.lzfCompress]] — h5py's `compression="lzf"`),
    * byte-shuffled first when `shuffle` (the h5py `shuffle=True`
    * pipeline order), and fletcher32-checksummed LAST when `fletcher32`
    * (checksum covers the stored bytes, the h5py/HDF5 convention). The
    * fixture half of the chunked/compressed read path ([[Hdf5]]
    * round-trips it, including the row-reassembly shuffle for
    * column-split shapes).
    * Classic container, v1 chunk B-tree with one leaf node per dataset. */
  def writeChunked(path: String, datasets: Seq[(String, Matrix)],
      chunkRows: Int, gzip: Boolean, chunkCols: Int = 0,
      shuffle: Boolean = false, lzf: Boolean = false,
      fletcher32: Boolean = false): Unit = {
    require(chunkRows > 0, "chunkRows must be positive")
    require(!(gzip && lzf), "pick one compressor: gzip or lzf")
    val sorted = datasets.sortBy(_._1)
    val bytes = writeChunkedClassic(sorted, chunkRows, gzip, chunkCols, shuffle, lzf, fletcher32)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    try out.write(bytes) finally out.close()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end() // release native zlib memory even if deflate throws
  }

  /** Forward HDF5 SHUFFLE filter (id 2): gather byte j of every element
    * into plane j. [[Hdf5]] undoes it on read. */
  private def shuffleBytes(data: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return data
    val n = data.length / elemSize
    val out = new Array[Byte](data.length)
    var j = 0
    var dst = 0
    while (j < elemSize) {
      var i = 0
      while (i < n) { out(dst) = data(i * elemSize + j); dst += 1; i += 1 }
      j += 1
    }
    if (dst < data.length) System.arraycopy(data, dst, out, dst, data.length - dst)
    out
  }

  private def writeChunkedClassic(
      datasets: Seq[(String, Matrix)], chunkRows: Int, gzip: Boolean,
      chunkCols: Int, shuffle: Boolean, lzf: Boolean = false,
      fletcher32: Boolean = false): Array[Byte] = {
    val K = 4
    require(datasets.length <= 2 * K, s"classic writer supports <= ${2 * K} datasets")
    val chunkKeySize = 8 + 3 * 8 // size, mask, offsets (row, col, elem)
    def ccOf(m: Matrix): Int = if (chunkCols > 0) chunkCols else m.cols

    // chunk payloads over the (rows x cols) grid: full-size buffers,
    // zero-padded at both edges, then deflate
    val chunkBlobs: Map[String, IndexedSeq[(Long, Long, Array[Byte])]] =
      datasets.map { case (name, m) =>
        val elem = elemSize(m)
        val raw = rawData(m)
        val cc = ccOf(m)
        val nR = math.max(1, (m.rows + chunkRows - 1) / chunkRows)
        val nC = math.max(1, (m.cols + cc - 1) / cc)
        val cs = for (ci <- 0 until nR; cj <- 0 until nC) yield {
          val buf = new Array[Byte](chunkRows * cc * elem)
          var r = 0
          while (r < chunkRows && ci * chunkRows + r < m.rows) {
            val srcCol = cj * cc
            val nCols = math.max(0, math.min(cc, m.cols - srcCol))
            if (nCols > 0) System.arraycopy(
              raw, ((ci * chunkRows + r) * m.cols + srcCol) * elem,
              buf, r * cc * elem, nCols * elem)
            r += 1
          }
          val filtered0 = if (shuffle) shuffleBytes(buf, elem) else buf
          val filtered1 =
            if (gzip) deflate(filtered0)
            else if (lzf) H5Filters.lzfCompress(filtered0)
            else filtered0
          ((ci * chunkRows).toLong, (cj * cc).toLong,
            if (fletcher32) H5Filters.fletcherAppend(filtered1) else filtered1)
        }
        (name, cs.toIndexedSeq)
      }.toMap

    def chunkedLayoutBody(btreeAddr: Long, m: Matrix): Array[Byte] = {
      val b = le(23)
      b.put(3.toByte) // layout version 3
      b.put(2.toByte) // chunked
      b.put(3.toByte) // dimensionality = rank + 1 (element-size dim)
      b.putLong(btreeAddr)
      b.putInt(chunkRows); b.putInt(ccOf(m)); b.putInt(elemSize(m))
      b.array()
    }

    // pipeline entries in write order: shuffle (cd = element size) first,
    // then the compressor (deflate cd = level; lzf cd empty), then
    // fletcher32 last so the checksum covers the stored bytes — the
    // h5py shuffle+compression+fletcher32 ordering
    def filterBody(m: Matrix): Array[Byte] = {
      val entries =
        (if (shuffle) Seq((2, Seq(elemSize(m)))) else Nil) ++
          (if (gzip) Seq((1, Seq(6))) else Nil) ++
          (if (lzf) Seq((H5Filters.LzfId, Seq.empty[Int])) else Nil) ++
          (if (fletcher32) Seq((H5Filters.Fletcher32Id, Seq.empty[Int])) else Nil)
      val size = 8 + entries.map { case (_, cd) =>
        8 + 4 * cd.length + (if (cd.length % 2 == 1) 4 else 0)
      }.sum
      val b = le(size)
      b.put(1.toByte); b.put(entries.length.toByte) // pipeline v1, nfilters
      b.put(new Array[Byte](6)) // reserved
      entries.foreach { case (id, cd) =>
        b.putShort(id.toShort)
        b.putShort(0.toShort) // name length 0
        b.putShort(0.toShort) // flags
        b.putShort(cd.length.toShort)
        cd.foreach(b.putInt)
        if (cd.length % 2 == 1) b.putInt(0) // v1 pads client data to 8 bytes
      }
      b.array()
    }

    def dsHeader(m: Matrix, btreeAddr: Long): Array[Byte] = v1ObjectHeader(
      Seq(
        v1Message(0x0001, dataspaceV1Body(m)),
        v1Message(0x0003, datatypeBody(m))) ++
        (if (gzip || shuffle || lzf || fletcher32) Seq(v1Message(0x000B, filterBody(m))) else Nil) :+
        v1Message(0x0008, chunkedLayoutBody(btreeAddr, m)))

    // --- address layout (mirrors writeClassic's fixed header region)
    var heapOff = 8
    val nameOffsets = datasets.map { case (name, _) =>
      val off = heapOff
      heapOff += pad8(name.length + 1)
      (name, off.toLong)
    }.toMap
    val heapDataSize = pad8(heapOff)
    val rootHeaderAddr = 96L
    val rootHeaderLen = 16 + 8 + 16
    val heapHdrAddr = rootHeaderAddr + rootHeaderLen
    val heapDataAddr = heapHdrAddr + 32
    val btreeAddr = heapDataAddr + heapDataSize
    val btreeLen = 24 + (2 * K + 1) * 8 + 2 * K * 8
    val snodAddr = btreeAddr + btreeLen
    val snodLen = 8 + 2 * K * 40
    var cursor = snodAddr + snodLen
    val headerAddrs = datasets.map { case (name, m) =>
      val a = cursor
      cursor += dsHeader(m, 0L).length
      (name, a)
    }.toMap
    val chunkBtreeAddrs = datasets.map { case (name, _) =>
      val n = chunkBlobs(name).length
      val a = cursor
      cursor += pad8(24 + n * (chunkKeySize + 8) + chunkKeySize)
      (name, a)
    }.toMap
    val chunkAddrs: Map[String, IndexedSeq[Long]] = datasets.map { case (name, _) =>
      val as = chunkBlobs(name).map { case (_, _, blob) =>
        val a = cursor
        cursor += pad8(blob.length)
        a
      }
      (name, as)
    }.toMap
    val eof = cursor

    val out = le(eof.toInt)
    // superblock v0 + root STE (same as writeClassic)
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.put(0.toByte)
    out.put(8.toByte); out.put(8.toByte)
    out.put(0.toByte)
    out.putShort(K.toShort)
    out.putShort(16.toShort)
    out.putInt(0)
    out.putLong(0L)
    out.putLong(Undef)
    out.putLong(eof)
    out.putLong(Undef)
    out.putLong(0L)
    out.putLong(rootHeaderAddr)
    out.putInt(1); out.putInt(0)
    out.putLong(btreeAddr); out.putLong(heapHdrAddr)

    val stBody = { val b = le(16); b.putLong(btreeAddr); b.putLong(heapHdrAddr); b.array() }
    out.put(v1ObjectHeader(Seq(v1Message(0x0011, stBody))))

    out.put("HEAP".getBytes("ASCII"))
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.putLong(heapDataSize.toLong)
    out.putLong(1L)
    out.putLong(heapDataAddr)
    val heapData = new Array[Byte](heapDataSize)
    nameOffsets.foreach { case (name, off) =>
      System.arraycopy(name.getBytes("UTF-8"), 0, heapData, off.toInt, name.length)
    }
    out.put(heapData)

    out.put("TREE".getBytes("ASCII"))
    out.put(0.toByte); out.put(0.toByte)
    out.putShort(1.toShort)
    out.putLong(Undef); out.putLong(Undef)
    out.putLong(0L)
    out.putLong(snodAddr)
    out.putLong(nameOffsets(datasets.last._1))

    out.position(snodAddr.toInt)
    out.put("SNOD".getBytes("ASCII"))
    out.put(1.toByte); out.put(0.toByte)
    out.putShort(datasets.length.toShort)
    datasets.foreach { case (name, _) =>
      out.putLong(nameOffsets(name))
      out.putLong(headerAddrs(name))
      out.putInt(0); out.putInt(0)
      out.putLong(0L); out.putLong(0L)
    }

    datasets.foreach { case (name, m) =>
      out.position(headerAddrs(name).toInt)
      out.put(dsHeader(m, chunkBtreeAddrs(name)))
    }

    // chunk B-trees (one leaf node each) + chunk data
    datasets.foreach { case (name, m) =>
      val blobs = chunkBlobs(name)
      val addrs = chunkAddrs(name)
      out.position(chunkBtreeAddrs(name).toInt)
      out.put("TREE".getBytes("ASCII"))
      out.put(1.toByte) // node type: chunk
      out.put(0.toByte) // level
      out.putShort(blobs.length.toShort)
      out.putLong(Undef); out.putLong(Undef)
      blobs.zipWithIndex.foreach { case ((rowOff, colOff, blob), ci) =>
        out.putInt(blob.length) // stored size
        out.putInt(0) // filter mask
        out.putLong(rowOff)
        out.putLong(colOff)
        out.putLong(0L) // element-dim offset
        out.putLong(addrs(ci)) // child: chunk address
      }
      // final key: first offset past the last chunk
      out.putInt(0); out.putInt(0)
      out.putLong(blobs.map(_._1).max + chunkRows)
      out.putLong(m.cols.toLong); out.putLong(elemSize(m).toLong)
      blobs.zipWithIndex.foreach { case ((_, _, blob), ci) =>
        out.position(addrs(ci).toInt)
        out.put(blob)
      }
    }
    out.array()
  }

  // -------------------------------------------------------------- modern v2

  private def v2Message(mtype: Int, body: Array[Byte]): Array[Byte] = {
    val b = le(4 + body.length)
    b.put(mtype.toByte)
    b.putShort(body.length.toShort)
    b.put(0.toByte) // flags
    b.put(body)
    b.array()
  }

  private def dataspaceV2Body(m: Matrix): Array[Byte] = {
    val b = le(20)
    b.put(2.toByte) // version
    b.put(2.toByte) // rank
    b.put(0.toByte) // flags
    b.put(1.toByte) // type: simple
    b.putLong(m.rows.toLong)
    b.putLong(m.cols.toLong)
    b.array()
  }

  private def v2ObjectHeader(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val msgLen = msgs.map(_.length).sum
    require(msgLen < 256, "v2 writer keeps chunk-0 size in one byte")
    val b = le(4 + 1 + 1 + 1 + msgLen + 4)
    b.put("OHDR".getBytes("ASCII"))
    b.put(2.toByte) // version
    b.put(0.toByte) // flags: 1-byte chunk size, nothing optional
    b.put(msgLen.toByte)
    msgs.foreach(b.put)
    val sum = lookup3(b.array(), 0, b.position())
    b.putInt(sum)
    b.array()
  }

  private def linkMessageBody(name: String, headerAddr: Long): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    val b = le(3 + nb.length + 8)
    b.put(1.toByte) // version
    b.put(0.toByte) // flags: 1-byte name length, hard link
    b.put(nb.length.toByte)
    b.put(nb)
    b.putLong(headerAddr)
    b.array()
  }

  private def writeModern(datasets: Seq[(String, Matrix)]): Array[Byte] = {
    def dsHeader(m: Matrix, dataAddr: Long): Array[Byte] = v2ObjectHeader(Seq(
      v2Message(0x01, dataspaceV2Body(m)),
      v2Message(0x03, datatypeBody(m)),
      v2Message(0x08, layoutBody(dataAddr, m.rows.toLong * m.cols * elemSize(m)))))

    def rootHeader(links: Seq[(String, Long)]): Array[Byte] =
      v2ObjectHeader(links.map { case (n, a) => v2Message(0x06, linkMessageBody(n, a)) })

    val superblockLen = 48
    var cursor = superblockLen.toLong
    val rootAddr = cursor
    cursor += pad8(rootHeader(datasets.map(d => (d._1, 0L))).length)
    val headerAddrs = datasets.map { case (name, m) =>
      val a = cursor
      cursor += pad8(dsHeader(m, 0L).length)
      (name, a)
    }.toMap
    val dataAddrs = datasets.map { case (name, m) =>
      val a = cursor
      cursor += pad8(m.rows * m.cols * elemSize(m))
      (name, a)
    }.toMap
    val eof = cursor

    val out = le(eof.toInt)
    out.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.put(2.toByte) // superblock version
    out.put(8.toByte); out.put(8.toByte) // size of offsets / lengths
    out.put(0.toByte) // consistency flags
    out.putLong(0L) // base
    out.putLong(Undef) // superblock extension
    out.putLong(eof)
    out.putLong(rootAddr)
    out.putInt(lookup3(out.array(), 0, out.position()))

    out.position(rootAddr.toInt)
    out.put(rootHeader(datasets.map(d => (d._1, headerAddrs(d._1)))))
    datasets.foreach { case (name, m) =>
      out.position(headerAddrs(name).toInt)
      out.put(dsHeader(m, dataAddrs(name)))
    }
    datasets.foreach { case (name, m) =>
      out.position(dataAddrs(name).toInt)
      out.put(rawData(m))
    }
    out.array()
  }

  /** Bob Jenkins' lookup3 `hashlittle` (public domain), the checksum HDF5
    * v2+ metadata blocks carry. */
  private[sources] def lookup3(data: Array[Byte], offset: Int, length: Int): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + length
    var b = a
    var c = a
    var i = offset
    var len = length
    def u(p: Int): Int = data(p) & 0xFF
    while (len > 12) {
      a += u(i) + (u(i + 1) << 8) + (u(i + 2) << 16) + (u(i + 3) << 24)
      b += u(i + 4) + (u(i + 5) << 8) + (u(i + 6) << 16) + (u(i + 7) << 24)
      c += u(i + 8) + (u(i + 9) << 8) + (u(i + 10) << 16) + (u(i + 11) << 24)
      // mix
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      if (len >= 12) throw new IllegalStateException("unreachable")
      var k = len
      while (k > 8) { c += u(i + k - 1) << ((k - 9) * 8); k -= 1 }
      k = math.min(len, 8)
      while (k > 4) { b += u(i + k - 1) << ((k - 5) * 8); k -= 1 }
      k = math.min(len, 4)
      while (k > 0) { a += u(i + k - 1) << ((k - 1) * 8); k -= 1 }
      // final
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }
}

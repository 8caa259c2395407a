package graft.sources

import java.io.IOException

/** Pure-JVM implementations of the two remaining common h5py filter
  * configs beyond deflate+shuffle: the LZF codec (filter id 32000,
  * h5py's bundled third-party filter; stream format per the public
  * liblzf spec — literal runs of <=32 bytes and 13-bit/264-byte
  * back-references) and the Fletcher-32 checksum filter (id 3; HDF5's
  * h5checksum variant — 16-bit big-endian words, partial sums folded
  * every 360 words in WRAPPING uint32 arithmetic, odd trailing byte in
  * the high half). Shared by [[Hdf5]] (decode/verify on read, inside
  * executor tasks) and [[Hdf5Writer]] (encode fixtures).
  *
  * Reference behavior: vector-index example/example.py writes plain-gzip
  * h5py files; these filters cover the neighboring h5py configs
  * (`compression="lzf"`, `fletcher32=True`) that would otherwise reject.
  */
object H5Filters {

  val LzfId = 32000
  val Fletcher32Id = 3

  /** Decompress an LZF stream to exactly `outLen` bytes. Control byte
    * < 32 = literal run of ctrl+1 bytes; otherwise a back-reference of
    * length (ctrl>>5)+2 (+ extension byte when the 3-bit length field
    * saturates) at distance ((ctrl&0x1f)<<8 | next)+1. */
  def lzfDecompress(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = 0
    var op = 0
    while (ip < in.length) {
      val ctrl = in(ip) & 0xff
      ip += 1
      if (ctrl < 32) {
        val run = ctrl + 1
        if (op + run > outLen || ip + run > in.length)
          throw new IOException("corrupt LZF stream: literal run overruns buffer")
        System.arraycopy(in, ip, out, op, run)
        ip += run
        op += run
      } else {
        var len = ctrl >> 5
        if (len == 7) {
          if (ip >= in.length) throw new IOException("corrupt LZF stream: truncated length")
          len += in(ip) & 0xff
          ip += 1
        }
        len += 2
        if (ip >= in.length) throw new IOException("corrupt LZF stream: truncated reference")
        val ref = op - (((ctrl & 0x1f) << 8) | (in(ip) & 0xff)) - 1
        ip += 1
        if (ref < 0 || op + len > outLen)
          throw new IOException("corrupt LZF stream: back-reference out of range")
        // byte-by-byte: references may overlap their own output (RLE)
        var i = 0
        while (i < len) { out(op + i) = out(ref + i); i += 1 }
        op += len
      }
    }
    if (op != outLen)
      throw new IOException(s"corrupt LZF stream: expected $outLen bytes, produced $op")
    out
  }

  /** Greedy hash-table LZF compressor producing a stream [[lzfDecompress]]
    * (and liblzf's decoder) accepts: match length <= 264, distance
    * <= 8192, literals flushed in runs of <= 32. Incompressible data
    * grows by ~1/32 — HDF5 chunks store whatever the pipeline yields, so
    * that is valid (h5py's filter instead stores raw + filter-mask bit;
    * the read path honors both). */
  def lzfCompress(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    val out = new java.io.ByteArrayOutputStream(n + n / 16 + 16)
    val htab = new Array[Int](1 << 14)
    java.util.Arrays.fill(htab, -1)
    def hash3(i: Int): Int = {
      val v = ((in(i) & 0xff) << 16) | ((in(i + 1) & 0xff) << 8) | (in(i + 2) & 0xff)
      (((v * 2654435761L) >>> 16) & (htab.length - 1)).toInt
    }
    var litStart = 0
    def flushLiterals(until: Int): Unit = {
      var s = litStart
      while (s < until) {
        val run = math.min(32, until - s)
        out.write(run - 1)
        out.write(in, s, run)
        s += run
      }
      litStart = until
    }
    var ip = 0
    while (ip + 2 < n) {
      val hv = hash3(ip)
      val cand = htab(hv)
      htab(hv) = ip
      if (cand >= 0 && ip - cand <= 8192 &&
          in(cand) == in(ip) && in(cand + 1) == in(ip + 1) && in(cand + 2) == in(ip + 2)) {
        val dist = ip - cand - 1
        var len = 3
        val maxLen = math.min(264, n - ip)
        while (len < maxLen && in(cand + len) == in(ip + len)) len += 1
        flushLiterals(ip)
        val l = len - 2
        if (l < 7) out.write((l << 5) | (dist >> 8))
        else {
          out.write((7 << 5) | (dist >> 8))
          out.write(l - 7)
        }
        out.write(dist & 0xff)
        ip += len
        litStart = ip
      } else ip += 1
    }
    flushLiterals(n)
    out.toByteArray
  }

  /** HDF5's Fletcher-32 over the first `len` bytes: 16-bit BIG-endian
    * words, sums folded every 360 words. The 360-word block can
    * marginally overflow uint32 in the original C — masking to 32 bits
    * at each fold reproduces that wrapping arithmetic exactly (additions
    * commute with mod 2^32, and a Long cannot overflow within a block). */
  def fletcher32(data: Array[Byte], len: Int): Int = {
    var sum1 = 0L
    var sum2 = 0L
    var i = 0
    var remaining = len / 2
    def fold(s: Long): Long = { val w = s & 0xffffffffL; (w & 0xffff) + (w >>> 16) }
    while (remaining > 0) {
      var tlen = math.min(360, remaining)
      remaining -= tlen
      while (tlen > 0) {
        sum1 += ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = fold(sum1)
      sum2 = fold(sum2)
    }
    if ((len & 1) == 1) {
      sum1 += (data(i) & 0xff) << 8
      sum2 += sum1
      sum1 = fold(sum1)
      sum2 = fold(sum2)
    }
    sum1 = fold(sum1)
    sum2 = fold(sum2)
    ((sum2 << 16) | sum1).toInt
  }

  /** Forward fletcher32 filter: data + 4-byte little-endian checksum
    * (H5Zfletcher32's UINT32ENCODE). */
  def fletcherAppend(data: Array[Byte]): Array[Byte] = {
    val c = fletcher32(data, data.length)
    val out = java.util.Arrays.copyOf(data, data.length + 4)
    out(data.length) = c.toByte
    out(data.length + 1) = (c >> 8).toByte
    out(data.length + 2) = (c >> 16).toByte
    out(data.length + 3) = (c >> 24).toByte
    out
  }

  /** Reverse fletcher32 filter: verify and strip the trailing 4-byte
    * checksum. Accepts the little-endian encoding and its byte-reversed
    * form (HDF5 reads both — pre-1.6.3 files stored the checksum with
    * the opposite endianness). */
  def fletcherVerifyStrip(data: Array[Byte], context: => String): Array[Byte] = {
    if (data.length < 4)
      throw new IOException(s"fletcher32 chunk shorter than its checksum ($context)")
    val n = data.length - 4
    val computed = fletcher32(data, n)
    val stored = (data(n) & 0xff) | ((data(n + 1) & 0xff) << 8) |
      ((data(n + 2) & 0xff) << 16) | ((data(n + 3) & 0xff) << 24)
    if (stored != computed && Integer.reverseBytes(stored) != computed)
      throw new IOException(
        f"fletcher32 checksum mismatch ($context): stored 0x$stored%08x, computed 0x$computed%08x")
    java.util.Arrays.copyOfRange(data, 0, n)
  }
}

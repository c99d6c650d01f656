package graft.io

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.GzipCodec

/** Member-chunked ("bgzip-style") gzip for splittable text exports
  * (r12, guide §6 / §2.5 input skew).
  *
  * WHY: a standard gzip stream is one DEFLATE stream — unsplittable,
  * so reading a compressed text file back is ONE task no matter how
  * large the file, the documented 100 TB scale-killer of the dsv /
  * jsonlines roundtrips (the write parallelizes per partition; the
  * read of any one file serializes). RFC 1952 makes the fix cheap: a
  * gzip FILE is legally a CONCATENATION of members, and every
  * compliant reader (gunzip, java GZIPInputStream, Hadoop) must
  * decompress all of them — so a writer that closes a member every
  * ~1 MiB of uncompressed bytes (cutting only at line boundaries)
  * produces files any reader still consumes whole, while a reader
  * that knows the member framing can decode members IN PARALLEL.
  *
  * The framing is self-describing, the same trick as BGZF (the bgzip
  * format htslib standardized over RFC 1952's FEXTRA field): each
  * member's header carries an extra subfield ("GR", 4 bytes) holding
  * the member's TOTAL compressed length, so an indexer can hop from
  * header to header with one positioned read per member and no
  * decompression. Foreign gzip files simply lack the subfield and the
  * indexer reports them unsplittable (the caller falls back to the
  * ordinary whole-file read).
  */
object MemberGzip {

  /** Uncompressed bytes per member (cut at the previous line
    * boundary). 1 MiB keeps the per-member deflate dictionary reset
    * cost ~irrelevant (bgzip itself uses 64 KiB) while giving a
    * 128 MB - 1 GB output file hundreds of independent read splits. */
  val DefaultBlockBytes: Int = 1 << 20

  /** Hadoop conf key overriding the member size (tests use a tiny
    * value to force many members on small fixtures). */
  val BlockBytesKey = "graft.io.membergz.block.bytes"

  private[io] val Si1: Byte = 'G'
  private[io] val Si2: Byte = 'R'

  /** One member of an indexed file: byte offset and total length. */
  final case class Member(offset: Long, length: Long, firstOfFile: Boolean)

  /** Compress `data[0, len)` as ONE complete gzip member carrying the
    * GR length subfield; returns the member bytes. */
  private[io] def compressMember(data: Array[Byte], len: Int): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    val body = new ByteArrayOutputStream(math.max(64, len / 3))
    val buf = new Array[Byte](8192)
    deflater.setInput(data, 0, len); deflater.finish()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf, 0, buf.length)
      if (n > 0) body.write(buf, 0, n)
    }
    deflater.end()
    val comp = body.toByteArray
    val crc = new CRC32(); crc.update(data, 0, len)
    val total = 20 + comp.length + 8 // header(10)+XLEN(2)+subfield(8) + body + trailer(8)
    val out = new Array[Byte](total)
    // RFC 1952 header: magic, CM=deflate, FLG=FEXTRA, MTIME=0, XFL=0, OS=255
    out(0) = 0x1f.toByte; out(1) = 0x8b.toByte; out(2) = 8; out(3) = 4
    // bytes 4-9 zero except OS
    out(9) = 0xff.toByte
    def le16(p: Int, v: Int): Unit = { out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte }
    def le32(p: Int, v: Long): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte; out(p + 3) = ((v >> 24) & 0xff).toByte
    }
    le16(10, 8) // XLEN
    out(12) = Si1; out(13) = Si2; le16(14, 4) // subfield id + len
    require(total <= 0xffffffffL, s"gzip member too large: $total")
    le32(16, total.toLong) // the whole point: total member length
    System.arraycopy(comp, 0, out, 20, comp.length)
    le32(20 + comp.length, crc.getValue)
    le32(20 + comp.length + 4, len.toLong & 0xffffffffL)
    out
  }

  /** OutputStream that buffers uncompressed bytes and emits one gzip
    * member per ~blockBytes, cutting ONLY at '\n' so every member is
    * a whole number of text lines (the member-parallel reader parses
    * lines per member). A buffer with no newline keeps growing — a
    * single line never spans members. */
  final class MemberOutputStream(out: OutputStream, blockBytes: Int) extends OutputStream {
    private var buf = new Array[Byte](math.max(1024, blockBytes + (blockBytes >> 2)))
    private var used = 0
    private var members = 0

    override def write(b: Int): Unit = { ensure(1); buf(used) = b.toByte; used += 1; maybeFlush() }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(b, off, buf, used, len); used += len; maybeFlush()
    }

    private def ensure(n: Int): Unit =
      if (used + n > buf.length) {
        val grown = new Array[Byte](math.max(buf.length * 2, used + n))
        System.arraycopy(buf, 0, grown, 0, used); buf = grown
      }

    private def maybeFlush(): Unit =
      while (used >= blockBytes) {
        // cut at the LAST newline within the current block window; a
        // window without one means a line longer than the block —
        // keep accumulating until its newline arrives
        var cut = -1
        var i = math.min(used, blockBytes) - 1
        while (cut < 0 && i >= 0) { if (buf(i) == '\n') cut = i + 1; i -= 1 }
        if (cut < 0) return
        emit(cut)
      }

    private def emit(n: Int): Unit = {
      out.write(compressMember(buf, n))
      members += 1
      System.arraycopy(buf, n, buf, 0, used - n)
      used -= n
    }

    override def flush(): Unit = out.flush()

    override def close(): Unit = {
      if (used > 0 || members == 0) emit(used) // trailing lines, or a valid empty member
      out.close()
    }
  }

  /** Index a member-framed file by hopping headers: one positioned
    * read per member, no decompression. None when any member lacks
    * the GR subfield (a foreign gzip — unsplittable, fall back), when
    * the chain does not tile the file exactly, or on any malformed
    * header: the fallback path must own every undecidable case. */
  def memberIndex(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Option[Seq[Member]] = {
    val len = fs.getFileStatus(path).getLen
    if (len == 0) return None
    val in = fs.open(path)
    try {
      val hdr = new Array[Byte](20)
      val members = Seq.newBuilder[Member]
      var off = 0L
      while (off < len) {
        if (off + 20 > len) return None
        in.readFully(off, hdr, 0, 20)
        if ((hdr(0) & 0xff) != 0x1f || (hdr(1) & 0xff) != 0x8b || hdr(2) != 8) return None
        if ((hdr(3) & 0x04) == 0) return None // no FEXTRA: foreign gzip
        val xlen = (hdr(10) & 0xff) | ((hdr(11) & 0xff) << 8)
        if (xlen != 8 || hdr(12) != Si1 || hdr(13) != Si2 ||
          ((hdr(14) & 0xff) | ((hdr(15) & 0xff) << 8)) != 4) return None
        val total = (hdr(16) & 0xffL) | ((hdr(17) & 0xffL) << 8) |
          ((hdr(18) & 0xffL) << 16) | ((hdr(19) & 0xffL) << 24)
        if (total < 28 || off + total > len) return None
        members += Member(off, total, firstOfFile = off == 0L)
        off += total
      }
      Some(members.result())
    } catch {
      case _: EOFException => None
    } finally in.close()
  }

  /** Decode one member's lines. GZIPInputStream over the exact byte
    * range: it parses the header (skipping the extra field) and
    * verifies CRC32 + ISIZE on close of the single member. */
  def memberLines(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path,
      m: Member): Iterator[String] = {
    val raw = new Array[Byte](m.length.toInt)
    val in = fs.open(path)
    try in.readFully(m.offset, raw, 0, raw.length)
    finally in.close()
    val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
    val text = new String(gz.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    gz.close()
    if (text.isEmpty) Iterator.empty
    else text.linesIterator
  }

  private[io] def blockBytes(conf: Configuration): Int =
    conf.getInt(BlockBytesKey, DefaultBlockBytes)
}

/** Hadoop codec shim: standard GzipCodec (same ".gz" extension, same
  * decompression side) whose OUTPUT stream is the member-chunked
  * writer above. Registered per write via the Spark `compression`
  * option (full class name), so nothing else in the session changes.
  */
final class MemberGzipCodec extends GzipCodec {
  override def createOutputStream(out: OutputStream): org.apache.hadoop.io.compress.CompressionOutputStream =
    new org.apache.hadoop.io.compress.CompressionOutputStream(
      new MemberGzip.MemberOutputStream(out, MemberGzip.blockBytes(getConf))) {
      override def write(b: Int): Unit = this.out.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = this.out.write(b, off, len)
      override def finish(): Unit = ()
      override def resetState(): Unit = ()
    }

  override def createOutputStream(
      out: OutputStream,
      compressor: org.apache.hadoop.io.compress.Compressor)
      : org.apache.hadoop.io.compress.CompressionOutputStream =
    createOutputStream(out)
}

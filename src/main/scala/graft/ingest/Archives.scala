package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.util.zip.GZIPInputStream

/** Archive expansion (SURVEY S3–S5): tar / tar.gz / gz member extraction as
  * pure byte-level functions, used as `flatMap`s over `binaryFile` rows so a
  * daily archive expands to hourly members inside the task that read it —
  * the Spark analog of the reference's in-memory `tarfile`/`gzip` streaming
  * (radohydro.py:207-210, 292-306, 440). No temp files, no driver round-trip.
  *
  * Tar parsing is hand-rolled (POSIX ustar headers are 512-byte blocks with
  * octal size fields) to stay dependency-free.
  */
object Archives {

  final case class Member(name: String, bytes: Array[Byte])

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] =
    readAll(new GZIPInputStream(new ByteArrayInputStream(bytes)))

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Iterate regular-file members of a tar archive (plain or gzipped). */
  def untar(raw: Array[Byte]): Iterator[Member] = {
    val bytes = if (isGzip(raw)) gunzip(raw) else raw
    new Iterator[Member] {
      private var off = 0
      private var nextMember: Member = null
      advance()

      private def parseOctal(b: Array[Byte], start: Int, len: Int): Long = {
        var v = 0L; var i = start
        val end = start + len
        while (i < end) {
          val c = b(i)
          if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
          i += 1
        }
        v
      }

      @annotation.tailrec
      private def advance(): Unit = {
        nextMember = null
        if (off + 512 > bytes.length) return
        // all-zero block = end of archive
        var allZero = true
        var i = off
        while (allZero && i < off + 512) { if (bytes(i) != 0) allZero = false; i += 1 }
        if (allZero) return
        val nameEnd = {
          var e = off
          while (e < off + 100 && bytes(e) != 0) e += 1
          e
        }
        val name = new String(bytes, off, nameEnd - off, "US-ASCII")
        val size = parseOctal(bytes, off + 124, 12)
        val typeFlag = bytes(off + 156).toChar
        val dataStart = off + 512
        val padded = ((size + 511) / 512) * 512
        off = dataStart + padded.toInt
        if (typeFlag == '0' || typeFlag == 0.toChar) {
          // copyOfRange would silently ZERO-PAD past the end of a truncated
          // archive — fail loudly instead of fabricating member bytes
          require(dataStart + size <= bytes.length,
            s"tar: member '$name' claims ${size} bytes but archive is truncated")
          nextMember = Member(name, java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + size.toInt))
        } else advance()
      }

      def hasNext: Boolean = nextMember != null
      def next(): Member = {
        val m = nextMember; advance(); m
      }
    }
  }

  /** One level of expansion with gz-awareness: tar → members; bare .gz →
    * single decoded member; anything else → itself. Applying this twice
    * covers the reference's monthly-tar-of-daily-tars path (S4).
    */
  def expand(name: String, bytes: Array[Byte]): Iterator[Member] =
    if (name.endsWith(".tar") || name.endsWith(".tar.gz") || name.endsWith(".tgz"))
      untar(bytes)
    else if (isGzip(bytes))
      Iterator.single(Member(name.stripSuffix(".gz"), gunzip(bytes)))
    else Iterator.single(Member(name, bytes))

  /** Build a tar archive (test fixtures only). */
  def tar(members: Seq[Member]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { m =>
      val header = new Array[Byte](512)
      val nameBytes = m.name.getBytes("US-ASCII")
      System.arraycopy(nameBytes, 0, header, 0, math.min(nameBytes.length, 100))
      def putOctal(value: Long, offset: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(value)
        val padded = ("0" * (len - 1 - s.length)) + s
        val b = padded.getBytes("US-ASCII")
        System.arraycopy(b, 0, header, offset, len - 1)
      }
      putOctal(420, 100, 8) // mode 0644
      putOctal(0, 108, 8); putOctal(0, 116, 8)
      putOctal(m.bytes.length.toLong, 124, 12)
      putOctal(0, 136, 12)
      header(156) = '0'
      java.util.Arrays.fill(header, 148, 156, ' '.toByte)
      var chk = 0L
      header.foreach(b => chk += (b & 0xff))
      val chkStr = java.lang.Long.toOctalString(chk)
      val chkPad = ("0" * (6 - chkStr.length)) + chkStr
      System.arraycopy(chkPad.getBytes("US-ASCII"), 0, header, 148, 6)
      header(154) = 0; header(155) = ' '
      out.write(header)
      out.write(m.bytes)
      val pad = (512 - m.bytes.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}

package graft.ingest

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Self-contained raster image codec: real decoders for BMP (8-bit
  * palettized and 24-bit BGR, top-down and bottom-up, 4-byte row padding),
  * PNG (8-bit grayscale / truecolor, all five row filters, zlib IDAT,
  * CRC-validated chunks) and binary PNM (P5/P6 with comment-tolerant
  * headers) — plus matching encoders used to synthesize test payloads.
  *
  * This replaces the round-6/7 multimodal decode STUB with actual codec
  * work, the same way `ingest/GeoTiff.scala` replaced the raster stub with
  * a real TIFF reader (reference counterpart: radohydro.py:331-344 reads
  * rasters through GDAL; here the codec is hand-rolled because the
  * environment ships no imaging libraries). Decoded output is always
  * row-major, top-down, channel-interleaved bytes — the canonical layout
  * the feature extractor consumes.
  */
object ImageCodec {

  /** Decoded raster: `pixels.length == width * height * channels`, rows
    * top-down, channels interleaved (RGB for color, single byte for gray).
    */
  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Format sniff + decode. Throws IllegalArgumentException on anything
    * that is not a supported BMP / PNG / PNM payload (malformed headers,
    * bad CRCs, unsupported bit depths) — a production pipeline routes
    * those rows to a quarantine sink rather than guessing.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 2, "payload too short to sniff")
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
    else if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6')) decodePnm(bytes)
    else throw new IllegalArgumentException("unsupported image format")
  }

  // -------------------------------------------------------------------------
  // little-endian readers (BMP headers are LE)
  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  // -------------------------------------------------------------------------
  // BMP
  // -------------------------------------------------------------------------

  /** BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B). Supported: 8 bpp
    * palettized (emitted as gray when the palette is grayscale, RGB
    * otherwise) and 24 bpp BGR. Positive biHeight = bottom-up storage
    * (the BMP default), negative = top-down; rows pad to 4 bytes.
    */
  private def decodeBmp(b: Array[Byte]): Decoded = {
    require(b.length >= 54, "BMP truncated before headers")
    val dataOff = i32le(b, 10)
    val hdrSize = i32le(b, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = i32le(b, 18)
    val rawH = i32le(b, 22)
    val bottomUp = rawH > 0
    val height = math.abs(rawH)
    val bpp = u16le(b, 28)
    val compression = i32le(b, 30)
    require(compression == 0, s"unsupported BMP compression $compression")
    require(width > 0 && height > 0, "bad BMP dimensions")
    bpp match {
      case 8 =>
        // palette: biClrUsed entries (0 = 256) of BGRA right after the info header
        val clrUsed = i32le(b, 46) match { case 0 => 256; case n => n }
        val palOff = 14 + hdrSize
        require(b.length >= palOff + 4 * clrUsed, "BMP palette truncated")
        val palR = new Array[Byte](clrUsed)
        val palG = new Array[Byte](clrUsed)
        val palB = new Array[Byte](clrUsed)
        var gray = true
        var i = 0
        while (i < clrUsed) {
          palB(i) = b(palOff + 4 * i)
          palG(i) = b(palOff + 4 * i + 1)
          palR(i) = b(palOff + 4 * i + 2)
          if (palB(i) != palG(i) || palG(i) != palR(i)) gray = false
          i += 1
        }
        val stride = (width + 3) & ~3
        require(b.length >= dataOff + stride * height, "BMP pixel data truncated")
        val ch = if (gray) 1 else 3
        val out = new Array[Byte](width * height * ch)
        var row = 0
        while (row < height) {
          val src = dataOff + (if (bottomUp) (height - 1 - row) else row) * stride
          var x = 0
          while (x < width) {
            val idx = b(src + x) & 0xff
            require(idx < clrUsed, "BMP palette index out of range")
            if (gray) out(row * width + x) = palG(idx)
            else {
              val o = (row * width + x) * 3
              out(o) = palR(idx); out(o + 1) = palG(idx); out(o + 2) = palB(idx)
            }
            x += 1
          }
          row += 1
        }
        Decoded(width, height, ch, out)
      case 24 =>
        val stride = (width * 3 + 3) & ~3
        require(b.length >= dataOff + stride * height, "BMP pixel data truncated")
        val out = new Array[Byte](width * height * 3)
        var row = 0
        while (row < height) {
          val src = dataOff + (if (bottomUp) (height - 1 - row) else row) * stride
          var x = 0
          while (x < width) {
            val o = (row * width + x) * 3
            // stored BGR -> emitted RGB
            out(o) = b(src + 3 * x + 2)
            out(o + 1) = b(src + 3 * x + 1)
            out(o + 2) = b(src + 3 * x)
            x += 1
          }
          row += 1
        }
        Decoded(width, height, 3, out)
      case other => throw new IllegalArgumentException(s"unsupported BMP bpp $other")
    }
  }

  /** 8-bit grayscale BMP with a 256-entry gray palette, bottom-up rows. */
  def encodeBmp8Gray(width: Int, height: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == width * height)
    val stride = (width + 3) & ~3
    val dataOff = 14 + 40 + 256 * 4
    val size = dataOff + stride * height
    val b = new Array[Byte](size)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; w32(2, size); w32(10, dataOff)
    w32(14, 40); w32(18, width); w32(22, height) // positive height: bottom-up
    w16(26, 1); w16(28, 8); w32(30, 0); w32(34, stride * height)
    w32(46, 256)
    var i = 0
    while (i < 256) { // gray BGRA palette
      b(54 + 4 * i) = i.toByte; b(54 + 4 * i + 1) = i.toByte; b(54 + 4 * i + 2) = i.toByte
      i += 1
    }
    var row = 0
    while (row < height) {
      val dst = dataOff + (height - 1 - row) * stride
      System.arraycopy(pix, row * width, b, dst, width)
      row += 1
    }
    b
  }

  /** 24-bit BMP from interleaved RGB, bottom-up rows, BGR on disk. */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3)
    val stride = (width * 3 + 3) & ~3
    val dataOff = 54
    val size = dataOff + stride * height
    val b = new Array[Byte](size)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; w32(2, size); w32(10, dataOff)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, stride * height)
    var row = 0
    while (row < height) {
      val dst = dataOff + (height - 1 - row) * stride
      var x = 0
      while (x < width) {
        val s = (row * width + x) * 3
        b(dst + 3 * x) = rgb(s + 2); b(dst + 3 * x + 1) = rgb(s + 1); b(dst + 3 * x + 2) = rgb(s)
        x += 1
      }
      row += 1
    }
    b
  }

  // -------------------------------------------------------------------------
  // PNG
  // -------------------------------------------------------------------------

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** 8-bit color type 0 (gray) / 2 (RGB), no interlace. Chunk CRCs are
    * validated; IDAT chunks concatenate into one zlib stream; row filters
    * 0-4 (None/Sub/Up/Average/Paeth) are reversed per the PNG spec.
    */
  private def decodePng(b: Array[Byte]): Decoded = {
    require(b.length > 8 && PngSig.indices.forall(i => b(i) == PngSig(i)), "bad PNG signature")
    var off = 8
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new ByteArrayOutputStream()
    val crc = new CRC32()
    while (off + 8 <= b.length && !seenIend) {
      val len = i32be(b, off)
      require(len >= 0 && off + 12 + len <= b.length, "PNG chunk overruns payload")
      val typ = new String(b, off + 4, 4, "US-ASCII")
      crc.reset(); crc.update(b, off + 4, 4 + len)
      require(crc.getValue.toInt == i32be(b, off + 8 + len), s"PNG $typ chunk CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = i32be(b, off + 8); height = i32be(b, off + 12)
          val bitDepth = b(off + 16) & 0xff
          val colorType = b(off + 17) & 0xff
          val interlace = b(off + 20) & 0xff
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth")
          require(interlace == 0, "interlaced PNG unsupported")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case other => throw new IllegalArgumentException(s"unsupported PNG color type $other")
          }
          require(width > 0 && height > 0, "bad PNG dimensions")
          seenIhdr = true
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped (already CRC-checked)
      }
      off += 12 + len
    }
    require(seenIhdr && seenIend, "PNG missing IHDR/IEND")
    val raw = inflate(idat.toByteArray, (width * channels + 1) * height)
    val rowBytes = width * channels
    require(raw.length == (rowBytes + 1) * height, "PNG decompressed size mismatch")
    val out = new Array[Byte](rowBytes * height)
    var row = 0
    while (row < height) {
      val ft = raw(row * (rowBytes + 1)) & 0xff
      val src = row * (rowBytes + 1) + 1
      val dst = row * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = raw(src + i) & 0xff
        val a = if (i >= channels) out(dst + i - channels) & 0xff else 0 // left
        val up = if (row > 0) out(dst - rowBytes + i) & 0xff else 0 // above
        val c = if (row > 0 && i >= channels) out(dst - rowBytes + i - channels) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case 4 => x + paeth(a, up, c)
          case other => throw new IllegalArgumentException(s"bad PNG filter type $other")
        }
        out(dst + i) = recon.toByte
        i += 1
      }
      row += 1
    }
    Decoded(width, height, channels, out)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(z: Array[Byte], hint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new ByteArrayOutputStream(math.max(64, hint))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished() || !inf.needsInput(), "truncated PNG zlib stream")
      if (n == 0 && !inf.finished()) throw new IllegalArgumentException("truncated PNG zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** PNG encoder; `filterOf(row)` picks the per-row filter type (0-4), so
    * fixtures can exercise every reconstruction path. Gray when
    * channels == 1, RGB when 3.
    */
  def encodePng(width: Int, height: Int, channels: Int, pix: Array[Byte],
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(channels == 1 || channels == 3)
    require(pix.length == width * height * channels)
    val rowBytes = width * channels
    val raw = new Array[Byte]((rowBytes + 1) * height)
    var row = 0
    while (row < height) {
      val ft = filterOf(row) % 5
      raw(row * (rowBytes + 1)) = ft.toByte
      val dst = row * (rowBytes + 1) + 1
      val src = row * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = pix(src + i) & 0xff
        val a = if (i >= channels) pix(src + i - channels) & 0xff else 0
        val up = if (row > 0) pix(src - rowBytes + i) & 0xff else 0
        val c = if (row > 0 && i >= channels) pix(src - rowBytes + i - channels) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - ((a + up) >> 1)
          case 4 => x - paeth(a, up, c)
        }
        raw(dst + i) = filtered.toByte
        i += 1
      }
      row += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val zOut = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) zOut.write(buf, 0, def_.deflate(buf))
    def_.end()
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    val ihdr = new Array[Byte](13)
    def w32(arr: Array[Byte], o: Int, v: Int): Unit = {
      arr(o) = (v >> 24).toByte; arr(o + 1) = (v >> 16).toByte
      arr(o + 2) = (v >> 8).toByte; arr(o + 3) = v.toByte
    }
    w32(ihdr, 0, width); w32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = (if (channels == 1) 0 else 2).toByte
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zOut.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val hdr = new Array[Byte](8)
    hdr(0) = (data.length >> 24).toByte; hdr(1) = (data.length >> 16).toByte
    hdr(2) = (data.length >> 8).toByte; hdr(3) = data.length.toByte
    val t = typ.getBytes("US-ASCII")
    System.arraycopy(t, 0, hdr, 4, 4)
    out.write(hdr, 0, 8)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = crc.getValue.toInt
    out.write((c >> 24) & 0xff); out.write((c >> 16) & 0xff)
    out.write((c >> 8) & 0xff); out.write(c & 0xff)
  }

  // -------------------------------------------------------------------------
  // PNM (binary P5 gray / P6 RGB)
  // -------------------------------------------------------------------------

  private def decodePnm(b: Array[Byte]): Decoded = {
    val channels = if (b(1) == '5') 1 else 3
    var off = 2
    // header tokens: width height maxval, whitespace-separated, '#' comments
    def nextInt(): Int = {
      while (off < b.length &&
        (b(off) == ' ' || b(off) == '\t' || b(off) == '\n' || b(off) == '\r' || b(off) == '#')) {
        if (b(off) == '#') { while (off < b.length && b(off) != '\n') off += 1 }
        else off += 1
      }
      var v = 0; var any = false
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = v * 10 + (b(off) - '0'); off += 1; any = true
      }
      require(any, "malformed PNM header")
      v
    }
    val width = nextInt(); val height = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval <= 255, s"unsupported PNM maxval $maxval")
    require(width > 0 && height > 0, "bad PNM dimensions")
    off += 1 // exactly one whitespace byte after maxval, per spec
    val n = width * height * channels
    require(b.length >= off + n, "PNM pixel data truncated")
    val out = new Array[Byte](n)
    System.arraycopy(b, off, out, 0, n)
    Decoded(width, height, channels, out)
  }

  def encodePnm(width: Int, height: Int, channels: Int, pix: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3)
    require(pix.length == width * height * channels)
    val hdr = s"P${if (channels == 1) 5 else 6}\n# graft fixture\n$width $height\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + pix.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(pix, 0, out, hdr.length, pix.length)
    out
  }
}

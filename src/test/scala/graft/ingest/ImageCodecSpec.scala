package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Golden-layout tests for the raster codec. The decode checks here are
  * INDEPENDENT of the encoders: BMP bytes are hand-assembled (explicit
  * padding / bottom-up layout), and PNG streams are built by a spec-local
  * filter implementation + chunk writer, so a bug shared between
  * ImageCodec's encoder and decoder (same wrong predictor on both sides
  * would still round-trip) cannot pass.
  */
class ImageCodecSpec extends AnyFunSuite {

  // --- spec-local PNG assembly (independent of ImageCodec.encodePng) -------
  private def specChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((data.length >> 24) & 0xff); out.write((data.length >> 16) & 0xff)
    out.write((data.length >> 8) & 0xff); out.write(data.length & 0xff)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = crc.getValue.toInt
    out.write((c >> 24) & 0xff); out.write((c >> 16) & 0xff)
    out.write((c >> 8) & 0xff); out.write(c & 0xff)
    out.toByteArray
  }

  private def specDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def specPng(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte; ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte; ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    out.write(specChunk("IHDR", ihdr))
    out.write(specChunk("IDAT", specDeflate(raw)))
    out.write(specChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("BMP 8-bit gray: hand-built bytes with padding + bottom-up rows") {
    // 3x2 gray image, pixels top-down: row0 = 10,20,30  row1 = 40,50,60
    // stride pads 3 -> 4; stored bottom-up so row1 comes first on disk
    val dataOff = 14 + 40 + 256 * 4
    val b = new Array[Byte](dataOff + 4 * 2)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte; b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; w32(2, b.length); w32(10, dataOff)
    w32(14, 40); w32(18, 3); w32(22, 2); w16(26, 1); w16(28, 8); w32(46, 256)
    for (i <- 0 until 256; k <- 0 until 3) b(54 + 4 * i + k) = i.toByte
    // bottom row (image row 1) first, padding byte deliberately nonzero
    b(dataOff) = 40; b(dataOff + 1) = 50; b(dataOff + 2) = 60; b(dataOff + 3) = 99
    b(dataOff + 4) = 10; b(dataOff + 5) = 20; b(dataOff + 6) = 30; b(dataOff + 7) = 99
    val d = ImageCodec.decode(b)
    assert((d.width, d.height, d.channels) == ((3, 2, 1)))
    assert(d.pixels.map(_ & 0xff).toSeq == Seq(10, 20, 30, 40, 50, 60))
  }

  test("BMP 8-bit with a COLORED palette decodes through the palette to RGB") {
    val base = ImageCodec.encodeBmp8Gray(2, 1, Array[Byte](1, 2))
    // palette entry 1 -> BGR (5,6,7), entry 2 stays gray (2,2,2)
    base(54 + 4) = 5; base(54 + 5) = 6; base(54 + 6) = 7
    val d = ImageCodec.decode(base)
    assert(d.channels == 3)
    assert(d.pixels.map(_ & 0xff).toSeq == Seq(7, 6, 5, 2, 2, 2)) // RGB per pixel
  }

  test("BMP 24-bit: hand-built BGR bytes, padded rows, bottom-up") {
    // 1x2 image: top pixel RGB(1,2,3), bottom RGB(4,5,6); stride 3 -> 4
    val b = new Array[Byte](54 + 8)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte; b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; w32(2, b.length); w32(10, 54)
    w32(14, 40); w32(18, 1); w32(22, 2); w16(26, 1); w16(28, 24)
    b(54) = 6; b(55) = 5; b(56) = 4 // bottom row first, stored BGR
    b(58) = 3; b(59) = 2; b(60) = 1
    val d = ImageCodec.decode(b)
    assert((d.width, d.height, d.channels) == ((1, 2, 3)))
    assert(d.pixels.map(_ & 0xff).toSeq == Seq(1, 2, 3, 4, 5, 6))
  }

  test("BMP negative height means top-down row order") {
    val enc = ImageCodec.encodeBmp8Gray(2, 2, Array[Byte](1, 2, 3, 4))
    val d0 = ImageCodec.decode(enc)
    assert(d0.pixels.toSeq == Seq[Byte](1, 2, 3, 4))
    // flip to top-down: height = -2, and swap the stored rows to keep the
    // same logical image
    enc(22) = 0xfe.toByte; enc(23) = 0xff.toByte; enc(24) = 0xff.toByte; enc(25) = 0xff.toByte
    val dataOff = 14 + 40 + 1024
    val r0 = enc.slice(dataOff, dataOff + 4)
    System.arraycopy(enc, dataOff + 4, enc, dataOff, 4)
    System.arraycopy(r0, 0, enc, dataOff + 4, 4)
    val d1 = ImageCodec.decode(enc)
    assert(d1.pixels.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("PNG filters 0-4: spec-side filtered streams reconstruct to known pixels") {
    // 3x2 gray pixels: 10 60 40 / 90 20 250
    val px = Array(10, 60, 40, 90, 20, 250).map(_.toByte)
    // filter each row INDEPENDENTLY here, per the PNG spec text
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (ft0 <- 0 to 4; ft1 <- 0 to 4) {
      val raw = new Array[Byte](2 * 4)
      raw(0) = ft0.toByte; raw(4) = ft1.toByte
      for (row <- 0 to 1; i <- 0 to 2) {
        val x = px(row * 3 + i) & 0xff
        val a = if (i >= 1) px(row * 3 + i - 1) & 0xff else 0
        val up = if (row > 0) px((row - 1) * 3 + i) & 0xff else 0
        val c = if (row > 0 && i >= 1) px((row - 1) * 3 + i - 1) & 0xff else 0
        val ft = if (row == 0) ft0 else ft1
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - ((a + up) >> 1)
          case 4 => x - paeth(a, up, c)
        }
        raw(row * 4 + 1 + i) = f.toByte
      }
      val d = ImageCodec.decode(specPng(3, 2, 0, raw))
      assert(d.pixels.toSeq == px.toSeq, s"filters ($ft0,$ft1)")
    }
  }

  test("PNG RGB: spec-built Sub filter uses the per-CHANNEL left neighbor") {
    // 2x1 RGB: (10,20,30) (50,40,60); Sub filter deltas are per channel
    val raw = Array[Byte](1, 10, 20, 30, 40, 20, 30)
    val d = ImageCodec.decode(specPng(2, 1, 2, raw))
    assert(d.channels == 3)
    assert(d.pixels.map(_ & 0xff).toSeq == Seq(10, 20, 30, 50, 40, 60))
  }

  test("PNG chunk CRC corruption is rejected") {
    val good = ImageCodec.encodePng(4, 4, 1, Array.tabulate(16)(_.toByte))
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte // flip a bit in IEND's CRC
    intercept[IllegalArgumentException] { ImageCodec.decode(bad) }
  }

  test("PNG multi-IDAT streams concatenate") {
    // split the IDAT of a 4x3 encode into two chunks and re-assemble
    val px = Array.tabulate(12)(i => (i * 17).toByte)
    val one = ImageCodec.encodePng(4, 3, 1, px)
    // parse out the single IDAT payload
    var off = 8; var idat: Array[Byte] = null
    var pre = new ByteArrayOutputStream(); var post = new ByteArrayOutputStream()
    var seen = false
    while (off + 8 <= one.length) {
      val len = ((one(off) & 0xff) << 24) | ((one(off + 1) & 0xff) << 16) |
        ((one(off + 2) & 0xff) << 8) | (one(off + 3) & 0xff)
      val typ = new String(one, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idat = one.slice(off + 8, off + 8 + len); seen = true }
      else if (!seen) pre.write(one, off, 12 + len)
      else post.write(one, off, 12 + len)
      off += 12 + len
    }
    val out = new ByteArrayOutputStream()
    out.write(one, 0, 8); out.write(pre.toByteArray)
    out.write(specChunk("IDAT", idat.take(3)))
    out.write(specChunk("IDAT", idat.drop(3)))
    out.write(post.toByteArray)
    val d = ImageCodec.decode(out.toByteArray)
    assert(d.pixels.toSeq == px.toSeq)
  }

  test("PNM: P5/P6 with comments in the header") {
    val p5 = "P5\n# a comment\n 3 \n2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val d5 = ImageCodec.decode(p5)
    assert((d5.width, d5.height, d5.channels) == ((3, 2, 1)))
    assert(d5.pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    val rgb = Array.tabulate(6)(i => (i + 1).toByte)
    val d6 = ImageCodec.decode(ImageCodec.encodePnm(2, 1, 3, rgb))
    assert((d6.width, d6.height, d6.channels) == ((2, 1, 3)))
    assert(d6.pixels.toSeq == rgb.toSeq)
  }

  test("encode/decode round-trips across all five m4 formats") {
    val gray = Array.tabulate(32 * 24)(i => ((i * 31 + 7) % 256).toByte)
    val rgb = Array.tabulate(32 * 24 * 3)(i => ((i * 13 + 5) % 256).toByte)
    assert(ImageCodec.decode(ImageCodec.encodeBmp8Gray(32, 24, gray)).pixels.toSeq == gray.toSeq)
    assert(ImageCodec.decode(ImageCodec.encodeBmp24(32, 24, rgb)).pixels.toSeq == rgb.toSeq)
    assert(ImageCodec.decode(ImageCodec.encodePng(32, 24, 1, gray)).pixels.toSeq == gray.toSeq)
    assert(ImageCodec.decode(ImageCodec.encodePng(32, 24, 3, rgb)).pixels.toSeq == rgb.toSeq)
    assert(ImageCodec.decode(ImageCodec.encodePnm(32, 24, 3, rgb)).pixels.toSeq == rgb.toSeq)
  }

  test("unsupported payloads are rejected, not guessed") {
    intercept[IllegalArgumentException] { ImageCodec.decode("GIF89a....".getBytes) }
    intercept[IllegalArgumentException] { ImageCodec.decode(Array[Byte]('B')) }
  }
}

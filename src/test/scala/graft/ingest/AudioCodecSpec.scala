package graft.ingest

/** Golden-layout tests for the WAV codec. As with ImageCodecSpec, the
  * decode checks are INDEPENDENT of the encoder: the RIFF container is
  * hand-assembled byte by byte (explicit chunk lengths, word-alignment
  * padding, little-endian sample packing), so a bug shared between
  * AudioCodec's encoder and decoder cannot round-trip its way past.
  */
import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  private def handWav(channels: Int, rate: Int, bits: Int, data: Array[Byte],
      extraChunk: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val extra = extraChunk.map { case (t, d) => 8 + d.length + (d.length & 1) }.getOrElse(0)
    val riffLen = 4 + 24 + extra + 8 + data.length
    val b = new Array[Byte](8 + riffLen)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def wtag(o: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, b, o, 4)
    wtag(0, "RIFF"); w32(4, riffLen); wtag(8, "WAVE")
    var off = 12
    wtag(off, "fmt "); w32(off + 4, 16); w16(off + 8, 1); w16(off + 10, channels)
    w32(off + 12, rate); w32(off + 16, rate * channels * bits / 8)
    w16(off + 20, channels * bits / 8); w16(off + 22, bits)
    off += 24
    extraChunk.foreach { case (t, d) =>
      wtag(off, t); w32(off + 4, d.length)
      System.arraycopy(d, 0, b, off + 8, d.length)
      off += 8 + d.length + (d.length & 1)
    }
    wtag(off, "data"); w32(off + 4, data.length)
    System.arraycopy(data, 0, b, off + 8, data.length)
    b
  }

  test("hand-built 16-bit stereo: LE sample packing, interleaving, header fields") {
    // frames: (1000,-2), (-32768, 32767)
    val data = Array[Byte](
      0xe8.toByte, 0x03, 0xfe.toByte, 0xff.toByte,
      0x00, 0x80.toByte, 0xff.toByte, 0x7f)
    val d = AudioCodec.decodeWav(handWav(2, 44100, 16, data))
    assert((d.sampleRate, d.channels, d.bitsPerSample) == ((44100, 2, 16)))
    assert(d.samples.toSeq == Seq(1000, -2, -32768, 32767))
  }

  test("hand-built 8-bit mono: u8 samples widen as (b-128)*256") {
    val d = AudioCodec.decodeWav(handWav(1, 8000, 8, Array[Byte](0, 127, 128.toByte, 255.toByte)))
    assert((d.sampleRate, d.channels, d.bitsPerSample) == ((8000, 1, 8)))
    assert(d.samples.toSeq == Seq(-32768, -256, 0, 32512))
  }

  test("chunks before data are walked, not assumed absent (odd length pads)") {
    // a 3-byte chunk forces the word-alignment pad byte before data
    val withChunk = handWav(1, 8000, 8, Array[Byte](130.toByte, 126),
      extraChunk = Some(("LIST", Array[Byte](1, 2, 3))))
    val d = AudioCodec.decodeWav(withChunk)
    assert(d.samples.toSeq == Seq(512, -512))
  }

  test("encoder output decodes: 8/16-bit x mono/stereo round-trips") {
    // multiples of 256 survive the u8 narrowing exactly
    val s = Array.tabulate(240)(i => ((i * 37 + 11) % 256 - 128) * 256)
    for (bits <- Seq(8, 16); ch <- Seq(1, 2)) {
      val d = AudioCodec.decodeWav(AudioCodec.encodeWav(16000, ch, bits, s))
      assert((d.sampleRate, d.channels, d.bitsPerSample) == ((16000, ch, bits)), s"($bits,$ch)")
      assert(d.samples.toSeq == s.toSeq, s"($bits,$ch)")
    }
    // 16-bit also carries samples that are NOT multiples of 256
    val fine = Array(-32768, -1, 0, 1, 257, 32767)
    assert(AudioCodec.decodeWav(AudioCodec.encodeWav(8000, 2, 16, fine)).samples.toSeq == fine.toSeq)
  }

  test("non-WAV / non-PCM / bad-width payloads are rejected, not guessed") {
    intercept[IllegalArgumentException] { AudioCodec.decodeWav("RIFFxxxxAVI ".getBytes) }
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(Array[Byte](1, 2, 3)) }
    val float = handWav(1, 8000, 16, Array[Byte](0, 0))
    float(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(float) }
    val bad24 = handWav(1, 8000, 16, Array[Byte](0, 0, 0, 0, 0, 0))
    bad24(34) = 24 // bits = 24
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(bad24) }
    val noData = handWav(1, 8000, 8, Array.emptyByteArray)
    // truncate away the data chunk header entirely
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(noData.take(36)) }
  }

  test("data chunk length not frame-aligned is rejected") {
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(handWav(2, 8000, 16, Array[Byte](1, 2))) // 2 bytes, needs 4/frame
    }
  }
}

package graft.ingest

/** Self-contained PCM WAV (RIFF) codec: a real decoder for 8-bit unsigned
  * and 16-bit signed little-endian PCM, mono or stereo, chunk-walking the
  * RIFF container (fmt/data plus arbitrary skippable chunks, word-aligned
  * per the RIFF spec) — and a matching encoder used to synthesize test
  * payloads.
  *
  * Companion of [[ImageCodec]] for the audio half of the multimodal
  * surface (reference counterpart: radohydro.py has no media handling —
  * this is extension surface; the codec is hand-rolled because the
  * environment ships no audio libraries). Decoded output is always
  * 16-bit-normalized Int samples, channel-interleaved, so downstream
  * features are independent of the on-disk sample width: 8-bit unsigned
  * bytes normalize as (b - 128) * 256 (the standard u8→s16 widening),
  * 16-bit samples pass through.
  */
object AudioCodec {

  /** Decoded clip: `samples.length == frames * channels`, interleaved,
    * each sample 16-bit-normalized signed.
    */
  final case class DecodedAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** Parse a RIFF/WAVE payload. Throws IllegalArgumentException on
    * non-WAV payloads, non-PCM formats, or unsupported widths — the same
    * quarantine contract as [[ImageCodec.decode]].
    */
  def decodeWav(b: Array[Byte]): DecodedAudio = {
    require(b.length >= 12, "payload too short for a RIFF header")
    require(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE", "not a RIFF/WAVE payload")
    var off = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var seenFmt = false
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (dataOff < 0 || !seenFmt)) {
      val id = tag(b, off)
      val len = i32le(b, off + 4)
      require(len >= 0 && off + 8 + len <= b.length, s"RIFF chunk $id overruns payload")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val audioFormat = u16le(b, off + 8)
          require(audioFormat == 1, s"unsupported WAV format $audioFormat (PCM only)")
          channels = u16le(b, off + 10)
          sampleRate = i32le(b, off + 12)
          bits = u16le(b, off + 22)
          require(channels == 1 || channels == 2, s"unsupported channel count $channels")
          require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
          seenFmt = true
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // LIST/fact/cue etc.: skipped
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(seenFmt, "WAV missing fmt chunk")
    require(dataOff >= 0, "WAV missing data chunk")
    val bytesPer = bits / 8
    require(dataLen % (bytesPer * channels) == 0, "WAV data not frame-aligned")
    val n = dataLen / bytesPer
    val out = new Array[Int](n)
    var i = 0
    if (bits == 8) {
      while (i < n) { out(i) = ((b(dataOff + i) & 0xff) - 128) * 256; i += 1 }
    } else {
      while (i < n) { out(i) = u16le(b, dataOff + 2 * i).toShort.toInt; i += 1 }
    }
    DecodedAudio(sampleRate, channels, bits, out)
  }

  /** PCM WAV encoder from 16-bit-normalized samples. `bits == 8` stores
    * the u8 narrowing (sample/256 + 128 — exact inverse of the decoder's
    * widening for samples that are multiples of 256); `bits == 16` stores
    * the samples verbatim. A skippable LIST chunk is emitted before data
    * so decoders that don't walk chunks break loudly in tests.
    */
  def encodeWav(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int]): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(bits == 8 || bits == 16)
    require(samples.length % channels == 0)
    val info = "graft fixture".getBytes("US-ASCII")
    val infoPadded = info.length + (info.length & 1)
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val riffLen = 4 + (8 + 16) + (8 + infoPadded) + (8 + dataLen + (dataLen & 1))
    val b = new Array[Byte](8 + riffLen)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def wtag(o: Int, s: String): Unit = System.arraycopy(s.getBytes("US-ASCII"), 0, b, o, 4)
    wtag(0, "RIFF"); w32(4, riffLen); wtag(8, "WAVE")
    var off = 12
    wtag(off, "fmt "); w32(off + 4, 16)
    w16(off + 8, 1); w16(off + 10, channels); w32(off + 12, sampleRate)
    w32(off + 16, sampleRate * channels * bytesPer) // byte rate
    w16(off + 20, channels * bytesPer) // block align
    w16(off + 22, bits)
    off += 8 + 16
    wtag(off, "LIST"); w32(off + 4, info.length)
    System.arraycopy(info, 0, b, off + 8, info.length)
    off += 8 + infoPadded
    wtag(off, "data"); w32(off + 4, dataLen)
    off += 8
    var i = 0
    if (bits == 8) {
      while (i < samples.length) { b(off + i) = (samples(i) / 256 + 128).toByte; i += 1 }
    } else {
      while (i < samples.length) { w16(off + 2 * i, samples(i) & 0xffff); i += 1 }
    }
    b
  }
}

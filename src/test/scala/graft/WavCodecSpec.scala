package graft

import graft.operators.WavMedia
import graft.operators.WavMedia.WavCodec
import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec must be a STRUCTURAL parser, not an offset-44 byte
  * peek — these tests pin round-trip exactness, chunk walking over
  * junk chunks, word alignment, and loud failure on malformed input.
  */
class WavCodecSpec extends AnyFunSuite {

  private val pcm = Array[Short](0, 100, -100, 32767, -32768, 1, -1)

  test("round-trips header fields and samples exactly") {
    val bytes = WavCodec.encode(16000, pcm)
    val w = WavCodec.decode(bytes)
    assert(w.sampleRate === 16000)
    assert(w.channels === 1)
    assert(w.bitsPerSample === 16)
    assert(w.samples.toSeq === pcm.toSeq)
  }

  test("walks past an interposed junk chunk") {
    val bytes = WavCodec.encode(8000, pcm, extraChunk = true)
    val w = WavCodec.decode(bytes)
    assert(w.samples.toSeq === pcm.toSeq)
    // and the junk chunk really is between fmt and data in the bytes
    val s = new String(bytes.map(b => (b & 0xff).toChar))
    assert(s.indexOf("JUNK") > s.indexOf("fmt ") &&
      s.indexOf("JUNK") < s.indexOf("data"))
  }

  test("canonical no-extra-chunk file is exactly 44 + 2n bytes") {
    assert(WavCodec.encode(8000, pcm).length === 44 + 2 * pcm.length)
  }

  test("empty sample array round-trips") {
    assert(WavCodec.decode(WavCodec.encode(8000, Array.empty[Short]))
      .samples.isEmpty)
  }

  test("rejects bad magic, truncation, and non-PCM") {
    val good = WavCodec.encode(8000, pcm)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavCodec.decode(badMagic))
    assertThrows[IllegalArgumentException](WavCodec.decode(good.take(10)))
    // flip fmt code (offset 20, LE u16) to 3 = IEEE float
    val nonPcm = good.clone(); nonPcm(20) = 3
    assertThrows[IllegalArgumentException](WavCodec.decode(nonPcm))
    // truncate mid-data: chunk overruns RIFF payload
    assertThrows[IllegalArgumentException](
      WavCodec.decode(good.dropRight(3)))
  }

  test("WavDecoder maps a real parse onto the MediaDecoder seam") {
    val m = WavMedia.WavDecoder.decode(WavCodec.encode(12000, pcm))
    assert(m.width === 12000)
    assert(m.height === 1)
    assert(m.nFrames === pcm.length)
    assert(m.format === "pcm16")
  }

  test("synthSample matches the sqlH32 fold for a spot-check") {
    // v = (first 32 md5 bits of "d:k") % 65536 - 32768, in [-32768, 32767]
    val v = WavMedia.synthSample(7L, 3)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("7:3".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    assert(v === ((h % 65536L) - 32768).toShort)
    assert(v >= -32768 && v <= 32767)
  }
}

package graft

import graft.operators.PngMedia
import graft.operators.PngMedia.PngCodec
import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec must prove the full container + codec pipeline:
  * chunk framing with CRC verification, multi-IDAT zlib reassembly,
  * ancillary-chunk skipping, and all five scanline unfilter paths —
  * plus fail loudly on anything it doesn't support.
  */
class PngCodecSpec extends AnyFunSuite {

  // 4x6 raster: height 6 ⇒ rows exercise filters 0,1,2,3,4,0; values
  // chosen non-monotone so Sub/Up/Average/Paeth all produce wrap-around
  // (negative-mod-256) filtered bytes.
  private val w = 4
  private val h = 6
  private val rgb: Array[Byte] =
    Array.tabulate(w * h * 3)(i => (((i * 37) ^ (i << 3)) % 256).toByte)

  test("round-trips through encode/decode bit-exactly") {
    val p = PngCodec.decode(PngCodec.encode(w, h, rgb))
    assert(p.width === w && p.height === h)
    assert(p.rgb.toSeq === rgb.toSeq)
  }

  test("round-trips single-row and single-column rasters") {
    val row = Array.tabulate(5 * 3)(i => (i * 11).toByte)
    assert(PngCodec.decode(PngCodec.encode(5, 1, row)).rgb.toSeq === row.toSeq)
    val colD = Array.tabulate(7 * 3)(i => (250 - i * 7).toByte)
    assert(PngCodec.decode(PngCodec.encode(1, 7, colD)).rgb.toSeq === colD.toSeq)
  }

  test("the stream is split across two IDAT chunks") {
    val bytes = PngCodec.encode(w, h, rgb)
    def chunkTypes(b: Array[Byte]): Seq[String] = {
      val buf = java.nio.ByteBuffer.wrap(b)
      Iterator.iterate(8)(off => off + 12 + buf.getInt(off))
        .takeWhile(off => off + 8 <= b.length)
        .map(off => new String(b, off + 4, 4, "US-ASCII")).toSeq
    }
    val types = chunkTypes(bytes)
    assert(types.count(_ == "IDAT") === 2)
    assert(types.head === "IHDR" && types.last === "IEND")
    assert(types.contains("tEXt")) // ancillary chunk precedes IDAT
    assert(types.indexOf("tEXt") < types.indexOf("IDAT"))
  }

  test("corrupting any single payload byte breaks the CRC and is rejected") {
    val good = PngCodec.encode(w, h, rgb)
    // flip one byte inside the tEXt payload (would be silently ignored
    // by a parser that skips ancillary chunks WITHOUT checking CRC)
    val buf = java.nio.ByteBuffer.wrap(good)
    var off = 8
    var textOff = -1
    while (textOff < 0) {
      if (new String(good, off + 4, 4, "US-ASCII") == "tEXt") textOff = off + 8
      else off += 12 + buf.getInt(off)
    }
    val bad = good.clone(); bad(textOff) = (bad(textOff) ^ 0x40).toByte
    assertThrows[IllegalArgumentException](PngCodec.decode(bad))
  }

  test("rejects bad signature, truncation, and unsupported color types") {
    val good = PngCodec.encode(w, h, rgb)
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](PngCodec.decode(badSig))
    assertThrows[IllegalArgumentException](PngCodec.decode(good.take(20)))
    // color type byte lives at IHDR data +9 = absolute offset 8+8+9;
    // re-CRC the chunk so ONLY the color-type check can reject it
    val gray = good.clone(); gray(8 + 8 + 9) = 0
    val crc = new java.util.zip.CRC32()
    crc.update(gray, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(gray).putInt(8 + 8 + 13, crc.getValue.toInt)
    assertThrows[IllegalArgumentException](PngCodec.decode(gray))
  }

  test("PngDecoder maps a real parse onto the MediaDecoder seam") {
    val m = PngMedia.PngDecoder.decode(PngCodec.encode(w, h, rgb))
    assert(m.width === w && m.height === h)
    assert(m.nFrames === 1 && m.format === "rgb8")
  }

  test("unfiltering is exercised: encoded scanlines carry all 5 filter types") {
    val bytes = PngCodec.encode(w, h, rgb)
    // reassemble and inflate the IDAT stream, then read each row's
    // leading filter byte
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    while (off + 8 <= bytes.length) {
      val len = buf.getInt(off)
      if (new String(bytes, off + 4, 4, "US-ASCII") == "IDAT")
        idat.write(bytes, off + 8, len)
      off += 12 + len
    }
    val raw = new Array[Byte](h * (1 + w * 3))
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !infl.finished())
      got += infl.inflate(raw, got, raw.length - got)
    infl.end()
    val filters = (0 until h).map(y => raw(y * (1 + w * 3)).toInt)
    assert(filters === Seq(0, 1, 2, 3, 4, 0))
  }
}

package graft

import graft.operators.BmpMedia
import graft.operators.BmpMedia.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec must handle the three classic gotchas structurally:
  * BGR channel order, 4-byte row padding, and bottom-up vs top-down
  * row order — plus fail loudly on anything it doesn't support.
  */
class BmpCodecSpec extends AnyFunSuite {

  // 3x2 top-down raster with distinct per-channel values
  private val w = 3
  private val h = 2
  private val rgb: Array[Byte] = Array(
    10, 20, 30, 40, 50, 60, 70, 80, 90, // row 0 (top)
    1, 2, 3, 4, 5, 6, 7, 8, 9 // row 1
  ).map(_.toByte)

  test("round-trips a bottom-up file to the logical top-down raster") {
    val b = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
    assert(b.width === w && b.height === h)
    assert(b.rgb.toSeq === rgb.toSeq)
  }

  test("round-trips a top-down (negative height) file identically") {
    val bytes = BmpCodec.encode(w, h, rgb, topDown = true)
    // raw height field is negative
    val rawH = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(22)
    assert(rawH === -h)
    assert(BmpCodec.decode(bytes).rgb.toSeq === rgb.toSeq)
  }

  test("rows are padded to 4-byte boundaries (w=3 -> stride 12... use w=1)") {
    // width 1: 3 bytes of pixel + 1 pad byte per row
    val one = Array[Byte](11, 22, 33, 44, 55, 66)
    val bytes = BmpCodec.encode(1, 2, one)
    assert(bytes.length === 54 + 2 * 4)
    assert(BmpCodec.decode(bytes).rgb.toSeq === one.toSeq)
  }

  test("pixel bytes on disk are B,G,R") {
    val bytes = BmpCodec.encode(1, 1, Array[Byte](10, 20, 30))
    assert(bytes(54) === 30 && bytes(55) === 20 && bytes(56) === 10)
  }

  test("rejects bad magic, truncation, compression, and non-24bpp") {
    val good = BmpCodec.encode(w, h, rgb)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](BmpCodec.decode(badMagic))
    assertThrows[IllegalArgumentException](BmpCodec.decode(good.take(40)))
    val compressed = good.clone(); compressed(30) = 1
    assertThrows[IllegalArgumentException](BmpCodec.decode(compressed))
    val bpp8 = good.clone(); bpp8(28) = 8
    assertThrows[IllegalArgumentException](BmpCodec.decode(bpp8))
    assertThrows[IllegalArgumentException](BmpCodec.decode(good.dropRight(4)))
  }

  test("BmpDecoder maps a real parse onto the MediaDecoder seam") {
    val m = BmpMedia.BmpDecoder.decode(BmpCodec.encode(w, h, rgb))
    assert(m.width === w && m.height === h)
    assert(m.nFrames === 1 && m.format === "bgr24")
  }

  test("synthChan stays in [0, 255] and matches the md5 fold") {
    val v = BmpMedia.synthChan(5L, 2, 1, 0) & 0xff
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("5:2:1:0".getBytes("UTF-8"))
    val hh = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    assert(v === (hh % 256L).toInt)
  }
}

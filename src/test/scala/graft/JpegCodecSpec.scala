package graft

import graft.operators.JpegMedia
import graft.operators.JpegMedia.JpegCodec
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG codec must prove the full transform-codec
  * pipeline: marker/table parsing from the stream, canonical Huffman
  * decode, DC DPCM across blocks and components, the general AC
  * run/size path (EOB, ZRL, negative amplitudes), byte unstuffing,
  * dezigzag + dequant + IDCT, 4:2:0 interleave and upsampling — plus
  * fail loudly with the right quarantine class on anything broken.
  */
class JpegCodecSpec extends AnyFunSuite {

  test("DC-exact fixture round-trips to the formula pixels exactly") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 17L)) {
      val w = JpegMedia.synthW(id); val h = JpegMedia.synthH(id)
      val jpg = JpegCodec.decode(JpegMedia.synthJpeg(id))
      assert(jpg.width === w && jpg.height === h)
      var mismatches = 0
      for (y <- 0 until h; x <- 0 until w) {
        val yv = JpegMedia.synthVal(id, "jy", x / 8, y / 8)
        val cb = JpegMedia.synthVal(id, "jcb", x / 16, y / 16)
        val cr = JpegMedia.synthVal(id, "jcr", x / 16, y / 16)
        val p = (y * w + x) * 3
        if ((jpg.rgb(p) & 0xff) != JpegCodec.ycc2r(yv, cr) ||
          (jpg.rgb(p + 1) & 0xff) != JpegCodec.ycc2g(yv, cb, cr) ||
          (jpg.rgb(p + 2) & 0xff) != JpegCodec.ycc2b(yv, cb)) mismatches += 1
      }
      assert(mismatches === 0, s"doc $id: $mismatches pixel mismatches")
    }
  }

  test("4:2:0 interleave: each Y block lands in its own MCU quadrant") {
    // One MCU, four distinct constant Y quadrants, neutral chroma: the
    // decoded luma quadrants must come back in Y1 Y2 Y3 Y4 order — a
    // swapped interleave moves whole 8x8 squares.
    val quad = Array(40, 90, 140, 190)
    val yP = Array.tabulate(16 * 16) { i =>
      val x = i % 16; val y = i / 16
      quad((y / 8) * 2 + (x / 8))
    }
    val flat = Array.fill(8 * 8)(128)
    val jpg = JpegCodec.decode(JpegCodec.encodeYcc(16, 16, yP, flat.clone(), flat.clone()))
    for (by <- 0 to 1; bx <- 0 to 1) {
      val expected = quad(by * 2 + bx)
      // neutral chroma => R=G=B=Y under the BT.601 fixed-point convert
      val p = ((by * 8 + 3) * 16 + bx * 8 + 3) * 3
      assert((jpg.rgb(p) & 0xff) === expected,
        s"quadrant ($bx,$by) luma ${jpg.rgb(p) & 0xff} != $expected")
    }
  }

  test("general AC path: planted run/size coefficients decode against an independent IDCT") {
    // Hand-planted quantized coefficients exercising: long zero runs
    // (ZRL), negative amplitudes, multi-bit categories, a dense block,
    // and EOB-early blocks. Expected pixels computed by an
    // INDEPENDENT direct-form double-sum IDCT written here, not by the
    // codec's own path.
    val zz = JpegCodec.Zigzag
    def block(entries: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      entries.foreach { case (k, v) => b(zz(k)) = v } // k = zigzag position
      b
    }
    val y1 = block(0 -> 37, 1 -> -14, 5 -> 9, 23 -> -3, 40 -> 2, 63 -> 1) // tail coeff after long runs
    val y2 = block(0 -> -22, 17 -> 4, 18 -> -4)
    val y3 = block(0 -> 5) // DC only (EOB immediately)
    val y4 = block((0 until 30).map(k => k -> (if (k % 3 == 0) 3 - k % 7 else 1)): _*)
    val cb = block(0 -> 12, 2 -> -6)
    val cr = block(0 -> -9, 10 -> 5)
    val bytes = JpegCodec.encodeFromCoeffs(16, 16, Seq(y1, y2, y3, y4, cb, cr))
    val jpg = JpegCodec.decode(bytes)

    // independent reference: direct 2D IDCT in doubles over
    // dequantized NATURAL-order coefficients, DPCM-free (absolute DCs
    // as planted, since each component's first block has pred 0)
    def refIdct(coefs: Array[Int], q: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * (coefs(v * 8 + u) * q(v * 8 + u)).toDouble *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        val px = math.round(0.25 * s + 128.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, px))
      }
      out
    }
    val yRef = Map((0, 0) -> refIdct(y1, JpegCodec.QLum), (1, 0) -> refIdct(y2, JpegCodec.QLum),
      (0, 1) -> refIdct(y3, JpegCodec.QLum), (1, 1) -> refIdct(y4, JpegCodec.QLum))
    val cbRef = refIdct(cb, JpegCodec.QChr)
    val crRef = refIdct(cr, JpegCodec.QChr)
    var bad = 0
    for (y <- 0 until 16; x <- 0 until 16) {
      val yv = yRef((x / 8, y / 8))((y % 8) * 8 + (x % 8))
      val cbv = cbRef((y / 2) * 8 + x / 2)
      val crv = crRef((y / 2) * 8 + x / 2)
      val p = (y * 16 + x) * 3
      if ((jpg.rgb(p) & 0xff) != JpegCodec.ycc2r(yv, crv) ||
        (jpg.rgb(p + 1) & 0xff) != JpegCodec.ycc2g(yv, cbv, crv) ||
        (jpg.rgb(p + 2) & 0xff) != JpegCodec.ycc2b(yv, cbv)) bad += 1
    }
    assert(bad === 0, s"$bad pixels diverge from the independent IDCT")
  }

  test("DPCM chains across MCUs: non-first blocks carry DC differences") {
    // Two MCUs wide: the 5th Y block's planted DC is an absolute
    // value; the codec stores a DIFFERENCE. If DPCM were dropped the
    // second MCU's luma would be wrong.
    val zz = JpegCodec.Zigzag; val _ = zz
    val dcs = Seq(10, -5, 30, 0, 25, -10, 12, 60)
    def dcBlock(v: Int): Array[Int] = { val b = new Array[Int](64); b(0) = v; b }
    val blocks = Seq(dcBlock(dcs(0)), dcBlock(dcs(1)), dcBlock(dcs(2)), dcBlock(dcs(3)),
      dcBlock(3), dcBlock(-3),
      dcBlock(dcs(4)), dcBlock(dcs(5)), dcBlock(dcs(6)), dcBlock(dcs(7)),
      dcBlock(7), dcBlock(2))
    val jpg = JpegCodec.decode(JpegCodec.encodeFromCoeffs(32, 16, blocks))
    // luma at the center of each Y block = clamp(DC*8/8 + 128) = DC+128
    val positions = Seq((3, 3, 0), (11, 3, 1), (3, 11, 2), (11, 11, 3),
      (19, 3, 4), (27, 3, 5), (19, 11, 6), (27, 11, 7))
    for ((x, y, i) <- positions) {
      val cbv = if (x < 16) 3 + 128 else 7 + 128
      val crv = if (x < 16) -3 + 128 else 2 + 128
      val expR = JpegCodec.ycc2r(dcs(i) + 128, crv)
      val p = (y * 32 + x) * 3
      assert((jpg.rgb(p) & 0xff) === expR, s"block $i at ($x,$y)")
      val expB = JpegCodec.ycc2b(dcs(i) + 128, cbv)
      assert((jpg.rgb(p + 2) & 0xff) === expB, s"block $i blue at ($x,$y)")
    }
  }

  test("byte stuffing survives 0xFF-dense entropy segments") {
    // Sweep DCs to shake out codes that produce 0xFF bytes; every
    // variant must round-trip (a stuffing bug breaks bit alignment).
    for (dc <- -120 to 120 by 7) {
      val b = { val a = new Array[Int](64); a(0) = dc; a }
      val blocks = Seq.fill(6)(b.clone())
      val jpg = JpegCodec.decode(JpegCodec.encodeFromCoeffs(16, 16, blocks))
      // Y blocks: first has DC dc, rest DPCM diff 0 -> same value
      val expY = math.max(0, math.min(255, dc + 128))
      // chroma = same dc constant
      val p = (5 * 16 + 5) * 3
      val exp = JpegCodec.ycc2r(expY, math.max(0, math.min(255, dc + 128)))
      assert((jpg.rgb(p) & 0xff) === exp, s"dc=$dc")
    }
  }

  test("rejects corrupt payloads with the right quarantine class") {
    val good = JpegMedia.synthJpeg(7L)
    def msgOf(b: Array[Byte]): String =
      intercept[IllegalArgumentException](JpegCodec.decode(b)).getMessage
    // bad magic
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(msgOf(noSoi).contains("signature"))
    // truncated inside the entropy-coded scan
    assert(msgOf(good.dropRight(40)).toLowerCase.contains("truncat"))
    // truncated header (cut inside DQT)
    assert(msgOf(good.take(30)).toLowerCase.contains("truncat"))
    // progressive SOF rejected by class, not mis-decoded: flip SOF0->SOF2
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(msgOf(prog).contains("progressive"))
  }

  test("decoder reads tables from the stream, not from constants") {
    // Doubling every quant value in the DQT marker must double the
    // dequantized DC and therefore shift the decoded constant — proof
    // the decoder honors the file's tables. Find the DQT payload and
    // patch the luma DC step 8 -> 16.
    val good = JpegCodec.encodeFromCoeffs(16, 16,
      Seq.fill(6)({ val b = new Array[Int](64); b(0) = 10; b }))
    val dqtAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdb).get
    val patched = good.clone()
    patched(dqtAt + 5) = 16.toByte // Pq/Tq byte + first zigzag entry (DC)
    val jpg = JpegCodec.decode(patched)
    val orig = JpegCodec.decode(good)
    val p = (5 * 16 + 5) * 3
    // luma: 10*16/8 + 128 = 148 vs 10*8/8 + 128 = 138
    assert((orig.rgb(p + 2) & 0xff) === JpegCodec.ycc2b(138, 138))
    assert((jpg.rgb(p + 2) & 0xff) === JpegCodec.ycc2b(148, 138))
  }
}

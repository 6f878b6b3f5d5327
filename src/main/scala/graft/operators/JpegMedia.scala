package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth REAL decoder behind the [[Multimodal.MediaDecoder]] seam — and
  * the first ENTROPY-CODED, LOSSY one: baseline JFIF (SOF0) with 4:2:0
  * chroma subsampling, decoded end-to-end in pure JVM code. Where
  * [[PngMedia]] proves container + zlib, this proves the transform-codec
  * pipeline every image corpus at 100 TB is actually stored in:
  *
  *   - marker stream parsing (SOI/APP0/DQT/DHT/SOF0/SOS/EOI), with the
  *     quantization and Huffman tables read FROM THE FILE, not assumed;
  *   - canonical Huffman decode (BITS/HUFFVAL -> code tables), DC DPCM
  *     per component across the whole scan, AC run/size with EOB and
  *     ZRL, amplitude extend for negative coefficients;
  *   - 0xFF byte-unstuffing inside the entropy-coded segment;
  *   - dezigzag, dequantize, 8x8 IDCT, level shift + clamp;
  *   - 4:2:0 MCU interleave (Y1 Y2 Y3 Y4 Cb Cr) and 2x2 chroma
  *     upsampling;
  *   - fixed-point YCbCr->RGB with floor semantics mirrored exactly in
  *     the oracle SQL.
  *
  * The oracle fixture is built so the LOSSY codec round-trips EXACTLY:
  * every 8x8 block is constant (per-block luma, per-MCU chroma, both
  * hash-derived), so the only surviving DCT coefficient is the DC, the
  * DC quant step is 8 (= the FDCT's own DC gain), and a DC-only IDCT
  * reproduces the constant to well under the final rounding half-ulp.
  * The entropy layer still does real work — DPCM chains across blocks
  * and components, per-block Huffman DC categories, EOB per block —
  * and any interleave, DPCM, table-selection, or upsample slip moves
  * the positionally-weighted `wsum` witness. The general AC path
  * (run/size, ZRL, multi-coefficient blocks) is pinned by
  * `JpegCodecSpec` against an independent direct-form IDCT.
  *
  * Scale: encode -> decode -> feature-extract is partition-local; the
  * payload bytes never shuffle; the only exchange is the final orderBy.
  * Reference scope: the reference has no media handling at all — this
  * family exists for the 100 TB multimodal-curation story.
  */
object JpegMedia {

  /** Decoded image: top-down raster, row-major, RGB triples. */
  final case class Jpeg(width: Int, height: Int, rgb: Array[Byte])

  object JpegCodec {

    private def fail(msg: String) =
      throw new IllegalArgumentException(s"JPEG parse: $msg")

    /** Zigzag scan order: zigzag(k) = natural (row-major) index of the
      * k-th coefficient in scan order. */
    private[graft] val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** Quantization tables, natural order. AC entries are the JPEG
      * spec's Annex K example tables; the DC step is pinned to 8 — the
      * FDCT DC gain — so constant blocks round-trip exactly (see the
      * object doc). */
    private[graft] val QLum: Array[Int] = {
      val q = Array(
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99)
      q(0) = 8; q
    }
    private[graft] val QChr: Array[Int] = {
      val q = Array(
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99)
      q(0) = 8; q
    }

    // Annex K typical Huffman tables (BITS = #codes per length 1..16,
    // then HUFFVAL). The DECODER never sees these constants — it builds
    // its tables from the DHT markers in the byte stream.
    private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    private val DcLumVals = (0 to 11).toArray
    private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
    private val DcChrVals = (0 to 11).toArray
    private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
    private val AcLumVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
    private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
    private val AcChrVals = Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
      0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
      0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
      0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
      0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
      0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
      0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
      0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
      0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
      0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
      0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

    /** Canonical code assignment per JPEG C.2: codes of length L are
      * consecutive, starting from (prev + 1) << 1. Returns
      * symbol -> (code, length). */
    private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val out = Map.newBuilder[Int, (Int, Int)]
      for (len <- 1 to 16) {
        var i = 0
        while (i < bits(len - 1)) {
          out += vals(k) -> (code, len)
          code += 1; k += 1; i += 1
        }
        code <<= 1
      }
      out.result()
    }

    /** Decoder-side table: (length, code) -> symbol. Built from DHT
      * marker payloads, never from the compiled-in constants. */
    private final class HuffDecodeTable(bits: Array[Int], vals: Array[Int]) {
      val bySym: Map[(Int, Int), Int] = {
        var code = 0; var k = 0
        val b = Map.newBuilder[(Int, Int), Int]
        for (len <- 1 to 16) {
          var i = 0
          while (i < bits(len - 1)) {
            b += (len, code) -> vals(k)
            code += 1; k += 1; i += 1
          }
          code <<= 1
        }
        b.result()
      }
    }

    // ---------------- bit I/O with 0xFF stuffing ----------------

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0
      private var nbits = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >> i) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00) // byte stuffing
            acc = 0; nbits = 0
          }
          i -= 1
        }
      }
      /** Pad the final partial byte with 1-bits per the spec. */
      def flush(): Unit =
        if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    }

    private final class BitReader(data: Array[Byte], var pos: Int) {
      private var acc = 0
      private var nbits = 0
      private var sawEoi = false
      def bit(): Int = {
        if (nbits == 0) {
          if (sawEoi || pos >= data.length)
            fail("truncated inside entropy-coded scan")
          var b = data(pos) & 0xff; pos += 1
          if (b == 0xff) {
            if (pos >= data.length) fail("truncated inside entropy-coded scan")
            val m = data(pos) & 0xff; pos += 1
            if (m == 0x00) () // stuffed literal 0xFF
            else if (m == 0xd9) { sawEoi = true; fail("truncated inside entropy-coded scan") }
            else fail(f"unexpected marker 0xFF$m%02X inside scan")
            b = 0xff
          }
          acc = b; nbits = 8
        }
        nbits -= 1
        (acc >> nbits) & 1
      }
      def bits(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | bit(); i += 1 }
        v
      }
      def huff(t: HuffDecodeTable): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          code = (code << 1) | bit(); len += 1
          t.bySym.get((len, code)) match {
            case Some(sym) => return sym
            case None      => ()
          }
        }
        fail("invalid Huffman code (no symbol within 16 bits)")
      }
    }

    /** Amplitude "extend": map an s-bit magnitude field back to the
      * signed value (F.2.2.1). */
    private def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    /** Bit category of a DPCM difference / AC amplitude. */
    private def category(v: Int): Int = {
      var a = math.abs(v); var c = 0
      while (a != 0) { a >>= 1; c += 1 }
      c
    }

    // ---------------- DCT (direct form, float) ----------------

    private val CosT: Array[Double] =
      Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
        .flatten
    @inline private def cosT(x: Int, u: Int): Double = CosT(x * 8 + u)
    private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

    /** Forward DCT + quantize: 8x8 level-shifted samples -> quantized
      * coefficients in NATURAL order. */
    private[graft] def fdctQuant(block: Array[Int], q: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              s += block(y * 8 + x) * cosT(x, u) * cosT(y, v)
              x += 1
            }
            y += 1
          }
          val coef = 0.25 * cFac(u) * cFac(v) * s
          out(v * 8 + u) = math.round(coef / q(v * 8 + u)).toInt
          u += 1
        }
        v += 1
      }
      out
    }

    /** Dequantize + inverse DCT: quantized NATURAL-order coefficients ->
      * 8x8 samples (still level-shifted, unrounded). */
    private def idct(coefs: Array[Int], q: Array[Int]): Array[Double] = {
      val dq = new Array[Double](64)
      var i = 0
      while (i < 64) { dq(i) = coefs(i).toDouble * q(i); i += 1 }
      val out = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val c = dq(v * 8 + u)
              if (c != 0.0) s += cFac(u) * cFac(v) * c * cosT(x, u) * cosT(y, v)
              u += 1
            }
            v += 1
          }
          out(y * 8 + x) = 0.25 * s
          x += 1
        }
        y += 1
      }
      out
    }

    // ---------------- encoder ----------------

    private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
      out.write(0xff); out.write(m)
    }

    /** Entropy-encode one block (quantized NATURAL-order coefficients)
      * and return the new DC predictor. */
    private def writeBlock(bw: BitWriter, coefs: Array[Int], pred: Int,
        dcT: Map[Int, (Int, Int)], acT: Map[Int, (Int, Int)]): Int = {
      val dc = coefs(0)
      val diff = dc - pred
      val s = category(diff)
      val (c0, l0) = dcT(s)
      bw.put(c0, l0)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      // AC: walk zigzag positions 1..63 with run/size coding.
      var run = 0
      var k = 1
      while (k < 64) {
        val v = coefs(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16 }
          val sz = category(v)
          val (ac, al) = acT((run << 4) | sz)
          bw.put(ac, al)
          bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acT(0x00); bw.put(ec, el) } // EOB
      dc
    }

    /** Emit a complete baseline JFIF file for quantized coefficient
      * blocks in 4:2:0 MCU-interleaved order (Y1 Y2 Y3 Y4 Cb Cr per
      * MCU, NATURAL-order coefficients). Exposed so the spec can drive
      * the general AC path with hand-planted coefficients. */
    private[graft] def encodeFromCoeffs(w: Int, h: Int,
        blocks: Seq[Array[Int]]): Array[Byte] = {
      require(w % 16 == 0 && h % 16 == 0, "fixture dims are MCU-aligned")
      val out = new java.io.ByteArrayOutputStream()
      marker(out, 0xd8) // SOI
      // APP0 / JFIF
      marker(out, 0xe0); u16(out, 16)
      out.write("JFIF".getBytes("US-ASCII")); out.write(0)
      out.write(1); out.write(1) // version 1.1
      out.write(0); u16(out, 1); u16(out, 1) // no units, 1:1 density
      out.write(0); out.write(0) // no thumbnail
      // DQT: both tables, zigzag order as the spec requires
      marker(out, 0xdb); u16(out, 2 + 65 * 2)
      out.write(0x00); var i = 0; while (i < 64) { out.write(QLum(Zigzag(i))); i += 1 }
      out.write(0x01); i = 0; while (i < 64) { out.write(QChr(Zigzag(i))); i += 1 }
      // SOF0: 8-bit, 3 components, 4:2:0
      marker(out, 0xc0); u16(out, 17)
      out.write(8); u16(out, h); u16(out, w); out.write(3)
      out.write(1); out.write(0x22); out.write(0) // Y: 2x2 sampling, Q0
      out.write(2); out.write(0x11); out.write(1) // Cb: 1x1, Q1
      out.write(3); out.write(0x11); out.write(1) // Cr: 1x1, Q1
      // DHT: all four tables in one marker
      def dhtLen(b: Array[Int], v: Array[Int]) = 1 + 16 + v.length
      marker(out, 0xc4)
      u16(out, 2 + dhtLen(DcLumBits, DcLumVals) + dhtLen(AcLumBits, AcLumVals) +
        dhtLen(DcChrBits, DcChrVals) + dhtLen(AcChrBits, AcChrVals))
      def writeDht(cls: Int, id: Int, b: Array[Int], v: Array[Int]): Unit = {
        out.write((cls << 4) | id)
        b.foreach(x => out.write(x)); v.foreach(x => out.write(x))
      }
      writeDht(0, 0, DcLumBits, DcLumVals)
      writeDht(1, 0, AcLumBits, AcLumVals)
      writeDht(0, 1, DcChrBits, DcChrVals)
      writeDht(1, 1, AcChrBits, AcChrVals)
      // SOS
      marker(out, 0xda); u16(out, 12)
      out.write(3)
      out.write(1); out.write(0x00) // Y: DC0/AC0
      out.write(2); out.write(0x11) // Cb: DC1/AC1
      out.write(3); out.write(0x11) // Cr: DC1/AC1
      out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al
      // entropy-coded segment
      val bw = new BitWriter(out)
      val dcLum = buildEncodeTable(DcLumBits, DcLumVals)
      val acLum = buildEncodeTable(AcLumBits, AcLumVals)
      val dcChr = buildEncodeTable(DcChrBits, DcChrVals)
      val acChr = buildEncodeTable(AcChrBits, AcChrVals)
      var predY = 0; var predCb = 0; var predCr = 0
      val nMcus = (w / 16) * (h / 16)
      require(blocks.length == nMcus * 6, s"need ${nMcus * 6} blocks, got ${blocks.length}")
      var m = 0
      while (m < nMcus) {
        var j = 0
        while (j < 4) {
          predY = writeBlock(bw, blocks(m * 6 + j), predY, dcLum, acLum); j += 1
        }
        predCb = writeBlock(bw, blocks(m * 6 + 4), predCb, dcChr, acChr)
        predCr = writeBlock(bw, blocks(m * 6 + 5), predCr, dcChr, acChr)
        m += 1
      }
      bw.flush()
      marker(out, 0xd9) // EOI
      out.toByteArray
    }

    /** Full encoder from per-component sample planes: Y at w x h, Cb/Cr
      * at (w/2) x (h/2). Real FDCT + quantize per block. */
    def encodeYcc(w: Int, h: Int, yP: Array[Int], cbP: Array[Int],
        crP: Array[Int]): Array[Byte] = {
      val hw = w / 2
      def grab(plane: Array[Int], pw: Int, bx: Int, by: Int): Array[Int] =
        Array.tabulate(64)(i => plane((by * 8 + i / 8) * pw + bx * 8 + i % 8) - 128)
      val blocks = Seq.newBuilder[Array[Int]]
      var my = 0
      while (my < h / 16) {
        var mx = 0
        while (mx < w / 16) {
          blocks += fdctQuant(grab(yP, w, mx * 2, my * 2), QLum)
          blocks += fdctQuant(grab(yP, w, mx * 2 + 1, my * 2), QLum)
          blocks += fdctQuant(grab(yP, w, mx * 2, my * 2 + 1), QLum)
          blocks += fdctQuant(grab(yP, w, mx * 2 + 1, my * 2 + 1), QLum)
          blocks += fdctQuant(grab(cbP, hw, mx, my), QChr)
          blocks += fdctQuant(grab(crP, hw, mx, my), QChr)
          mx += 1
        }
        my += 1
      }
      encodeFromCoeffs(w, h, blocks.result())
    }

    /** Fixed-point YCbCr -> RGB, floor semantics, mirrored verbatim in
      * the oracle SQL (coefficients = round(2^16 * ITU-R BT.601)). */
    @inline private[graft] def ycc2r(y: Int, cr: Int): Int =
      clamp(Math.floorDiv(65536 * y + 91881 * (cr - 128) + 32768, 65536))
    @inline private[graft] def ycc2g(y: Int, cb: Int, cr: Int): Int =
      clamp(Math.floorDiv(65536 * y - 22554 * (cb - 128) - 46802 * (cr - 128) + 32768, 65536))
    @inline private[graft] def ycc2b(y: Int, cb: Int): Int =
      clamp(Math.floorDiv(65536 * y + 116130 * (cb - 128) + 32768, 65536))
    @inline private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    // ---------------- decoder ----------------

    def decode(bytes: Array[Byte]): Jpeg = {
      def u16At(p: Int): Int = {
        if (p + 1 >= bytes.length) fail("truncated header")
        ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      }
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
        fail("bad JPEG signature (no SOI)")
      val quant = scala.collection.mutable.Map[Int, Array[Int]]()
      val huff = scala.collection.mutable.Map[(Int, Int), HuffDecodeTable]()
      var width = 0; var height = 0
      // component id -> (hSamp, vSamp, quantId); scan selectors id -> (dc, ac)
      var comps: Vector[(Int, Int, Int, Int)] = Vector.empty
      var scanSel: Map[Int, (Int, Int)] = Map.empty
      var p = 2
      var scanStart = -1
      while (scanStart < 0) {
        if (p + 1 >= bytes.length) fail("truncated before SOS")
        if ((bytes(p) & 0xff) != 0xff) fail(f"expected marker, got 0x${bytes(p)}%02X")
        val m = bytes(p + 1) & 0xff
        p += 2
        m match {
          case 0xd9 => fail("EOI before any scan")
          case 0x01 => () // TEM, no payload
          case _ =>
            val len = u16At(p)
            val end = p + len
            if (end > bytes.length) fail("truncated marker segment")
            m match {
              case 0xdb => // DQT: one or more tables
                var q = p + 2
                while (q < end) {
                  val pq = (bytes(q) & 0xff) >> 4
                  val tq = bytes(q) & 0x0f
                  if (pq != 0) fail("16-bit quant tables unsupported")
                  if (q + 65 > end) fail("truncated DQT")
                  val t = new Array[Int](64)
                  var i = 0
                  while (i < 64) { t(Zigzag(i)) = bytes(q + 1 + i) & 0xff; i += 1 }
                  quant(tq) = t
                  q += 65
                }
              case 0xc4 => // DHT: one or more tables
                var q = p + 2
                while (q < end) {
                  val cls = (bytes(q) & 0xff) >> 4
                  val id = bytes(q) & 0x0f
                  if (q + 17 > end) fail("truncated DHT")
                  val bits = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
                  val n = bits.sum
                  if (q + 17 + n > end) fail("truncated DHT")
                  val vals = Array.tabulate(n)(i => bytes(q + 17 + i) & 0xff)
                  huff((cls, id)) = new HuffDecodeTable(bits, vals)
                  q += 17 + n
                }
              case 0xc0 => // SOF0 baseline
                if (bytes(p + 2) != 8) fail("only 8-bit precision supported")
                height = u16At(p + 3); width = u16At(p + 5)
                val nc = bytes(p + 7) & 0xff
                if (nc != 3) fail("only 3-component YCbCr supported")
                comps = Vector.tabulate(nc) { i =>
                  val b = p + 8 + i * 3
                  ((bytes(b) & 0xff), (bytes(b + 1) & 0xff) >> 4,
                    bytes(b + 1) & 0x0f, bytes(b + 2) & 0xff)
                }
              case 0xc2 => fail("progressive JPEG unsupported")
              case 0xda => // SOS
                val ns = bytes(p + 2) & 0xff
                if (ns != 3) fail("only full interleaved 3-component scan supported")
                scanSel = (0 until ns).map { i =>
                  val b = p + 3 + i * 2
                  (bytes(b) & 0xff) -> (((bytes(b + 1) & 0xff) >> 4, bytes(b + 1) & 0x0f))
                }.toMap
                scanStart = end
              case _ => () // APPn / COM / others: skip payload
            }
            p = end
        }
      }
      if (width == 0 || height == 0) fail("SOS before SOF0")
      val sampling = comps.map(c => (c._2, c._3))
      if (sampling != Vector((2, 2), (1, 1), (1, 1)))
        fail("only 4:2:0 sampling supported")
      // MCU-aligned padded dims (general baseline rule: ceil).
      val mcusX = (width + 15) / 16
      val mcusY = (height + 15) / 16
      val pw = mcusX * 16; val ph = mcusY * 16
      val yP = new Array[Int](pw * ph)
      val cbP = new Array[Int]((pw / 2) * (ph / 2))
      val crP = new Array[Int]((pw / 2) * (ph / 2))
      val br = new BitReader(bytes, scanStart)
      def tables(compIdx: Int): (HuffDecodeTable, HuffDecodeTable, Array[Int]) = {
        val (id, _, _, qid) = comps(compIdx)
        val (dcId, acId) = scanSel.getOrElse(id, fail("scan references unknown component"))
        (huff.getOrElse((0, dcId), fail("missing DC Huffman table")),
          huff.getOrElse((1, acId), fail("missing AC Huffman table")),
          quant.getOrElse(qid, fail("missing quant table")))
      }
      def decodeBlockTo(plane: Array[Int], planeW: Int, bx: Int, by: Int,
          compIdx: Int, pred: Int): Int = {
        val (dcT, acT, q) = tables(compIdx)
        val coefs = new Array[Int](64)
        val s = br.huff(dcT)
        if (s > 11) fail("invalid DC category")
        val dc = pred + extend(br.bits(s), s)
        coefs(0) = dc
        var k = 1
        var done = false
        while (k < 64 && !done) {
          val rs = br.huff(acT)
          val r = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else done = true // EOB
          } else {
            k += r
            if (k > 63) fail("AC run overruns block")
            coefs(Zigzag(k)) = extend(br.bits(sz), sz)
            k += 1
          }
        }
        val px = idct(coefs, q)
        var y0 = 0
        while (y0 < 8) {
          var x0 = 0
          while (x0 < 8) {
            val v = math.round(px(y0 * 8 + x0) + 128.0).toInt
            plane((by * 8 + y0) * planeW + bx * 8 + x0) =
              if (v < 0) 0 else if (v > 255) 255 else v
            x0 += 1
          }
          y0 += 1
        }
        dc
      }
      var predY = 0; var predCb = 0; var predCr = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          predY = decodeBlockTo(yP, pw, mx * 2, my * 2, 0, predY)
          predY = decodeBlockTo(yP, pw, mx * 2 + 1, my * 2, 0, predY)
          predY = decodeBlockTo(yP, pw, mx * 2, my * 2 + 1, 0, predY)
          predY = decodeBlockTo(yP, pw, mx * 2 + 1, my * 2 + 1, 0, predY)
          predCb = decodeBlockTo(cbP, pw / 2, mx, my, 1, predCb)
          predCr = decodeBlockTo(crP, pw / 2, mx, my, 2, predCr)
          mx += 1
        }
        my += 1
      }
      // upsample chroma 2x2 (replication) + color convert, crop padding
      val rgb = new Array[Byte](width * height * 3)
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          val y0 = yP(yy * pw + xx)
          val ci = (yy / 2) * (pw / 2) + xx / 2
          val cb = cbP(ci); val cr = crP(ci)
          val o = (yy * width + xx) * 3
          rgb(o) = ycc2r(y0, cr).toByte
          rgb(o + 1) = ycc2g(y0, cb, cr).toByte
          rgb(o + 2) = ycc2b(y0, cb).toByte
          xx += 1
        }
        yy += 1
      }
      Jpeg(width, height, rgb)
    }
  }

  /** The decoder seam adapter onto the shared MediaMeta shape. */
  object JpegDecoder extends Multimodal.MediaDecoder {
    def decode(payload: Array[Byte]): Multimodal.MediaMeta = {
      val j = JpegCodec.decode(payload)
      Multimodal.MediaMeta(width = j.width, height = j.height,
        nFrames = 1, format = "rgb8")
    }
  }

  /** Fixture dims: MCU-aligned, 1-3 MCUs wide x 1-2 tall so DC DPCM
    * chains cross MCU boundaries in both directions. */
  private[graft] def synthW(d: Long): Int = (16 * (1 + d % 3)).toInt
  private[graft] def synthH(d: Long): Int = (16 * (1 + d % 2)).toInt

  /** Per-8x8-block luma / per-MCU chroma constants — md5-derived, and
    * mirrored by [[graft.functions.PortableHash.sqlH32]] in the oracle. */
  private[graft] def synthVal(d: Long, tag: String, i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$tag:$i:$j".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (h % 256L).toInt
  }

  /** Build the DC-exact fixture payload for one doc: constant-per-block
    * luma, constant-per-MCU chroma, full real encode. */
  private[graft] def synthJpeg(d: Long): Array[Byte] = {
    val w = synthW(d); val h = synthH(d)
    val yP = Array.tabulate(w * h)(i => synthVal(d, "jy", (i % w) / 8, (i / w) / 8))
    val hw = w / 2; val hh = h / 2
    val cbP = Array.tabulate(hw * hh)(i => synthVal(d, "jcb", (i % hw) / 8, (i / hw) / 8))
    val crP = Array.tabulate(hw * hh)(i => synthVal(d, "jcr", (i % hw) / 8, (i / hw) / 8))
    JpegCodec.encodeYcc(w, h, yP, cbP, crP)
  }

  private val jpegSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("wsum", LongType)))

  val defs: Seq[QueryDef] = Seq(

    // YCbCr synth -> real baseline JPEG encode (FDCT, quant, DPCM,
    // Huffman, stuffing, 4:2:0 interleave) -> REAL decode (tables
    // parsed from the stream) -> integer pixel features. The oracle
    // recomputes the pixels formula-side: per-block Y / per-MCU CbCr
    // constants + the identical fixed-point floor color convert.
    // `wsum` is the positionally-weighted witness — an interleave,
    // DPCM, dezigzag, or upsample slip moves it even when plain
    // channel sums collide. Pure map stage until the final orderBy.
    QueryDef(
      "mm_jpeg_decode", {
        def hv(tag: String, i: String, j: String) =
          PortableHash.sqlH32(s"doc_id || ':$tag:' || ($i) || ':' || ($j)") + " % 256"
        Some(s"""
          WITH g AS (
            SELECT doc_id,
                   CAST(16 * (1 + doc_id % 3) AS BIGINT) AS w,
                   CAST(16 * (1 + doc_id % 2) AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, h, UNNEST(range(0, w)) AS x FROM g),
          ps AS (SELECT doc_id, x, UNNEST(range(0, h)) AS y FROM xs),
          ycc AS (
            SELECT doc_id, x, y,
                   ${hv("jy", "x // 8", "y // 8")} AS yv,
                   ${hv("jcb", "x // 16", "y // 16")} AS cb,
                   ${hv("jcr", "x // 16", "y // 16")} AS cr
            FROM ps),
          px AS (
            SELECT doc_id, x, y,
                   GREATEST(0, LEAST(255, CAST(FLOOR((65536 * yv + 91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
                   GREATEST(0, LEAST(255, CAST(FLOOR((65536 * yv - 22554 * (cb - 128) - 46802 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS g2,
                   GREATEST(0, LEAST(255, CAST(FLOOR((65536 * yv + 116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
            FROM ycc),
          feat AS (
            SELECT doc_id,
                   CAST(SUM(r) AS BIGINT) AS sum_r,
                   CAST(SUM(g2) AS BIGINT) AS sum_g,
                   CAST(SUM(b) AS BIGINT) AS sum_b,
                   CAST(SUM((x + 1) * (y + 1) * (r + 2 * g2 + 3 * b)) AS BIGINT)
                     AS wsum
            FROM px GROUP BY doc_id)
          SELECT g.doc_id, g.w AS width, g.h AS height,
                 f.sum_r, f.sum_g, f.sum_b, f.wsum
          FROM g JOIN feat f USING (doc_id)
          ORDER BY g.doc_id
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val jpg = JpegCodec.decode(synthJpeg(id))
            var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
            var y = 0
            while (y < jpg.height) {
              var x = 0
              while (x < jpg.width) {
                val p = (y * jpg.width + x) * 3
                val r0 = jpg.rgb(p) & 0xff
                val g0 = jpg.rgb(p + 1) & 0xff
                val b0 = jpg.rgb(p + 2) & 0xff
                sr += r0; sg += g0; sb += b0
                ws += (x + 1).toLong * (y + 1).toLong * (r0 + 2 * g0 + 3 * b0)
                x += 1
              }
              y += 1
            }
            Row(id, jpg.width.toLong, jpg.height.toLong, sr, sg, sb, ws)
          }
        }
        s.createDataFrame(rdd, jpegSchema).orderBy(col("doc_id"))
      }))
}

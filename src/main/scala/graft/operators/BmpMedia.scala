package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second REAL decoder behind the [[Multimodal.MediaDecoder]] seam:
  * uncompressed 24-bit BMP (BITMAPINFOHEADER) is fully decodable in
  * pure JVM code. Where [[WavMedia]] proves 1-D sample parsing, this
  * proves 2-D raster parsing with the three classic BMP gotchas a
  * pseudo-parser silently gets wrong:
  *
  *   - pixels are stored B,G,R (not RGB) — a channel swap flips
  *     `sum_r`/`sum_b` and fails the oracle;
  *   - each pixel row is padded to a 4-byte boundary — widths are
  *     chosen so most rows carry 1–3 pad bytes, and ignoring them
  *     shears every subsequent row;
  *   - positive height = BOTTOM-UP row order, negative = top-down —
  *     the fixture emits both parities, and the oracle's `top_row_sum`
  *     (a feature of the logical top row) catches a parser that reads
  *     rows in file order.
  *
  * Feature extraction is partition-local over payload bytes that never
  * shuffle; every feature is integer-exact and computed ONLY from the
  * parsed pixels (the synth raster is discarded after encoding).
  */
object BmpMedia {

  /** Parsed BMP: logical top-down raster, row-major, RGB triples. */
  final case class Bmp(width: Int, height: Int, rgb: Array[Byte])

  object BmpCodec {

    /** Encode a top-down RGB raster as a 24-bit uncompressed BMP.
      * `topDown = true` writes a negative-height (top-down) file;
      * otherwise the spec-default bottom-up layout. */
    def encode(width: Int, height: Int, rgb: Array[Byte],
        topDown: Boolean = false): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      val stride = ((width * 3) + 3) / 4 * 4
      val imageSize = stride * height
      val fileSize = 54 + imageSize
      val out = java.nio.ByteBuffer.allocate(fileSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
        .putInt(fileSize).putShort(0).putShort(0).putInt(54)
      out.putInt(40).putInt(width)
        .putInt(if (topDown) -height else height)
        .putShort(1).putShort(24).putInt(0).putInt(imageSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      val rows = if (topDown) 0 until height else (height - 1) to 0 by -1
      for (y <- rows) {
        var x = 0
        while (x < width) {
          val p = (y * width + x) * 3
          out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // B, G, R
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
      }
      out.array()
    }

    /** Structural parse to a logical top-down RGB raster. Strict on
      * everything this codec doesn't support (palettes, compression,
      * other header versions) — fail loudly, never guess. */
    def decode(bytes: Array[Byte]): Bmp = {
      def fail(msg: String) = throw new IllegalArgumentException(s"BMP parse: $msg")
      if (bytes.length < 54) fail(s"truncated header (${bytes.length} bytes)")
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bytes(0) != 'B' || bytes(1) != 'M') fail("bad magic")
      val dataOffset = buf.getInt(10)
      val hdrSize = buf.getInt(14)
      if (hdrSize < 40) fail(s"unsupported header size $hdrSize")
      val width = buf.getInt(18)
      val rawHeight = buf.getInt(22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      if (width <= 0 || height == 0) fail(s"bad dimensions ${width}x$rawHeight")
      if (buf.getShort(26) != 1) fail("planes != 1")
      val bpp = buf.getShort(28)
      if (bpp != 24) fail(s"expected 24 bpp, got $bpp")
      val compression = buf.getInt(30)
      if (compression != 0) fail(s"compressed BMP not supported ($compression)")
      val stride = ((width * 3) + 3) / 4 * 4
      if (dataOffset.toLong + stride.toLong * height > bytes.length)
        fail("pixel array overruns file")
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val src = dataOffset + srcRow * stride
        var x = 0
        while (x < width) {
          val s = src + x * 3
          val d = (y * width + x) * 3
          rgb(d) = bytes(s + 2)     // R from B,G,R
          rgb(d + 1) = bytes(s + 1)
          rgb(d + 2) = bytes(s)
          x += 1
        }
        y += 1
      }
      Bmp(width, height, rgb)
    }
  }

  /** The decoder seam adapter: real 2-D parse onto the shared
    * MediaMeta shape (single-frame raster). */
  object BmpDecoder extends Multimodal.MediaDecoder {
    def decode(payload: Array[Byte]): Multimodal.MediaMeta = {
      val b = BmpCodec.decode(payload)
      Multimodal.MediaMeta(width = b.width, height = b.height,
        nFrames = 1, format = "bgr24")
    }
  }

  /** Deterministic synth raster — mirrored in the oracle SQL. Widths
    * 8..16 ⇒ strides with 0–3 pad bytes; heights 4..8. */
  private[graft] def synthW(d: Long): Int = (8 + d % 9).toInt
  private[graft] def synthH(d: Long): Int = (4 + d % 5).toInt

  /** Channel c (0=R,1=G,2=B) of pixel (x, y) of doc d: first 32 md5
    * bits of "d:x:y:c" mod 256 — the JVM twin of PortableHash.sqlH32. */
  private[graft] def synthChan(d: Long, x: Int, y: Int, c: Int): Byte = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$x:$y:$c".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (h % 256L).toByte
  }

  private val bmpSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("top_row_sum", LongType)))

  val defs: Seq[QueryDef] = Seq(

    // Raster synth → real BMP encode (odd docs top-down, even
    // bottom-up) → REAL structural decode → integer pixel features,
    // scored by a formula-side oracle. `top_row_sum` is the
    // orientation witness, `sum_r` vs `sum_b` the channel-order
    // witness, and the 8..16 widths the padding witness. Pure map
    // stage until the final orderBy.
    QueryDef(
      "mm_bmp_decode", {
        def h(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
          WITH g AS (
            SELECT doc_id,
                   CAST(8 + doc_id % 9 AS BIGINT) AS w,
                   CAST(4 + doc_id % 5 AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, h, UNNEST(range(0, w)) AS x FROM g),
          ps AS (SELECT doc_id, x, UNNEST(range(0, h)) AS y FROM xs),
          px AS (
            SELECT doc_id, x, y,
                   ${h(0)} % 256 AS r,
                   ${h(1)} % 256 AS g2,
                   ${h(2)} % 256 AS b
            FROM ps),
          feat AS (
            SELECT doc_id,
                   CAST(SUM(r) AS BIGINT) AS sum_r,
                   CAST(SUM(g2) AS BIGINT) AS sum_g,
                   CAST(SUM(b) AS BIGINT) AS sum_b,
                   CAST(SUM(CASE WHEN y = 0 THEN r + g2 + b ELSE 0 END) AS BIGINT)
                     AS top_row_sum
            FROM px GROUP BY doc_id)
          SELECT g.doc_id, g.w AS width, g.h AS height,
                 f.sum_r, f.sum_g, f.sum_b, f.top_row_sum
          FROM g JOIN feat f USING (doc_id)
          ORDER BY g.doc_id
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val payload = {
              val w = synthW(id); val h = synthH(id)
              val rgb = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = (y * w + x) * 3
                  rgb(p) = synthChan(id, x, y, 0)
                  rgb(p + 1) = synthChan(id, x, y, 1)
                  rgb(p + 2) = synthChan(id, x, y, 2)
                  x += 1
                }
                y += 1
              }
              BmpCodec.encode(w, h, rgb, topDown = id % 2 == 1)
            }
            val bmp = BmpCodec.decode(payload)
            var sr = 0L; var sg = 0L; var sb = 0L; var top = 0L
            var i = 0
            while (i < bmp.rgb.length) {
              val v = bmp.rgb(i) & 0xff
              (i % 3: @annotation.switch) match {
                case 0 => sr += v
                case 1 => sg += v
                case 2 => sb += v
              }
              if (i < bmp.width * 3) top += v
              i += 1
            }
            Row(id, bmp.width.toLong, bmp.height.toLong, sr, sg, sb, top)
          }
        }
        s.createDataFrame(rdd, bmpSchema).orderBy(col("doc_id"))
      }))
}

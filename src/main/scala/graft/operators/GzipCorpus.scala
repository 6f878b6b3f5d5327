package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gzip text-corpus ingestion (RFC 1952) — the WARC-style shard walk a
  * 100 TB web-text pipeline actually performs: each shard is a
  * CONCATENATION of per-document gzip members, and the reader must
  * walk member boundaries, verify per-member integrity (header CRC16,
  * body CRC32, ISIZE), decode real DEFLATE, and — the part naive
  * readers get wrong — account for SYNC LOSS: a member whose header is
  * smashed takes the rest of its shard with it, because member length
  * is only discoverable by inflating. The census separates recoverable
  * damage (bad stored CRC/ISIZE: boundaries survive, walk continues)
  * from fatal damage (bad magic: everything after is skipped), which
  * is exactly the re-sync economics that decide whether a 100 TB crawl
  * shard format needs a framing index.
  *
  * Planted truth (oracle knows it in closed form; Spark must
  * REDISCOVER it through real decode outcomes): members are documents,
  * shards are doc_id div 16. By doc_id % 13: 3 → stored-CRC bit flip
  * (crc_mismatch), 7 → stored ISIZE bit flip (length_mismatch), 11 →
  * encoded WITH FNAME+FHCRC (decodes ok — exercises optional-field
  * parsing), else plain ok; doc_id % 53 == 5 → smashed magic
  * (bad_magic + cascade). The magic modulus is deliberately PRIME TO
  * and larger than the shard width: 16 consecutive ids always contain
  * one of any residue mod 13 (so a mod-13 magic class would cascade in
  * EVERY shard and the truncated class below could never surface),
  * while mod 53 hits ~26% of shards and leaves the rest walking to
  * their last member.
  * The LAST member of every shard ≡ 2 (mod 5) is truncated 6 bytes
  * into its trailer (truncated). Precedence mirrors what a strict
  * walker actually observes: bad_magic (header read first) >
  * truncated (trailer missing before any compare) > crc_mismatch >
  * length_mismatch; every member after a shard's first bad_magic is
  * skipped_sync_loss regardless of its own planting.
  *
  * chars_recovered witnesses the REAL round-trip: only members that
  * decode ok contribute their decoded code-point count, which must
  * equal the oracle's SUM(LENGTH(text)) over planted-ok members.
  *
  * Determinism: encode/decode both happen Spark-side (the oracle sees
  * only the closed-form census), so deflate byte-stability across
  * engines is not load-bearing; CRC32/ISIZE/lengths are exact
  * integers. Scale: blobs are built and walked partition-locally after
  * one shard-keyed shuffle of the text; payloads never shuffle
  * compressed+decoded twice; the census is a tiny groupBy.
  */
object GzipCorpus {

  object GzipCodec {
    private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }

    /** One gzip member: fixed header (MTIME=0, XFL=0, OS=255 — no
      * wall-clock in the bytes), optional FNAME+FHCRC, raw DEFLATE
      * body, CRC32 + ISIZE trailer. */
    def encodeMember(payload: Array[Byte], name: Option[String] = None): Array[Byte] = {
      val head = new java.io.ByteArrayOutputStream()
      val flg = if (name.isDefined) 0x08 | 0x02 else 0 // FNAME | FHCRC
      head.write(0x1f); head.write(0x8b); head.write(8); head.write(flg)
      head.write(0); head.write(0); head.write(0); head.write(0) // MTIME = 0
      head.write(0); head.write(255)
      name.foreach { n => val b = n.getBytes("US-ASCII"); head.write(b, 0, b.length); head.write(0) }
      val out = new java.io.ByteArrayOutputStream()
      val hb = head.toByteArray
      out.write(hb, 0, hb.length)
      if ((flg & 0x02) != 0) { // FHCRC: CRC32 of the header so far, low 16 bits, LE
        val c = new java.util.zip.CRC32(); c.update(hb)
        val v = (c.getValue & 0xffff).toInt
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      }
      val defl = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      defl.setInput(payload); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) {
        val n = defl.deflate(buf)
        out.write(buf, 0, n)
      }
      defl.end()
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      le32(out, crc.getValue)
      le32(out, payload.length.toLong & 0xffffffffL)
      out.toByteArray
    }

    /** Strict decode of the member starting at `off`.
      * @return (status, inflated payload or null, offset of the next
      *         member, or -1 when the boundary is unknowable — bad
      *         header, malformed deflate, or a truncated tail — i.e.
      *         the walk has lost sync). crc/length mismatches keep a
      *         VALID next offset: inflate consumed exactly the
      *         member's compressed bytes, so the boundary survives. */
    def decodeMemberAt(b: Array[Byte], off: Int): (String, Array[Byte], Int) = {
      def fatal(s: String) = (s, null: Array[Byte], -1)
      if (off + 10 > b.length) return fatal("truncated")
      if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b)
        return fatal("bad_magic")
      if ((b(off + 2) & 0xff) != 8) return fatal("parse_error") // CM != deflate
      val flg = b(off + 3) & 0xff
      if ((flg & 0xe0) != 0) return fatal("parse_error") // reserved bits
      var p = off + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > b.length) return fatal("truncated")
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > b.length) return fatal("truncated")
      }
      def skipZString(): Boolean = {
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) false else { p += 1; true }
      }
      if ((flg & 0x08) != 0 && !skipZString()) return fatal("truncated") // FNAME
      if ((flg & 0x10) != 0 && !skipZString()) return fatal("truncated") // FCOMMENT
      if ((flg & 0x02) != 0) { // FHCRC: verify, not skip
        if (p + 2 > b.length) return fatal("truncated")
        val c = new java.util.zip.CRC32(); c.update(b, off, p - off)
        val want = (c.getValue & 0xffff).toInt
        val got = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2
        if (want != got) return fatal("parse_error")
      }
      val infl = new java.util.zip.Inflater(true)
      infl.setInput(b, p, b.length - p)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      try {
        while (!infl.finished()) {
          val n = infl.inflate(buf)
          // zero-progress guard (same contract as the PNG path): a
          // stall that isn't stream-end is truncation or malice
          if (n == 0 && !infl.finished()) {
            val st = if (infl.needsInput()) "truncated" else "parse_error"
            infl.end(); return fatal(st)
          }
          bos.write(buf, 0, n)
        }
      } catch {
        case _: java.util.zip.DataFormatException =>
          infl.end(); return fatal("parse_error")
      }
      val consumed = infl.getBytesRead.toInt
      infl.end()
      val t = p + consumed
      if (t + 8 > b.length) return fatal("truncated")
      val data = bos.toByteArray
      def rdLe32(q: Int): Long =
        (b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8) |
          ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val next = t + 8
      if (rdLe32(t) != crc.getValue) ("crc_mismatch", null, next)
      else if (rdLe32(t + 4) != (data.length.toLong & 0xffffffffL))
        ("length_mismatch", null, next)
      else ("ok", data, next)
    }

    /** Walk up to `maxMembers` concatenated members; stops on sync
      * loss (next boundary unknowable). The caller knows the planned
      * member count and marks the unvisited remainder skipped. */
    def walk(blob: Array[Byte], maxMembers: Int): Seq[(String, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
      var off = 0
      var synced = true
      while (synced && off < blob.length && out.length < maxMembers) {
        val (st, data, next) = decodeMemberAt(blob, off)
        out += ((st, data))
        if (next < 0) synced = false else off = next
      }
      out.toSeq
    }
  }

  private val rowSchema = StructType(Seq(
    StructField("status", StringType),
    StructField("chars", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_gzip_ingest",
      Some("""
        WITH m AS (
          SELECT doc_id, doc_id // 16 AS shard, LENGTH(text) AS len
          FROM documents),
        mx AS (SELECT shard, MAX(doc_id) AS last_id FROM m GROUP BY shard),
        cls AS (
          SELECT m.doc_id, m.shard, m.len,
                 CASE
                   WHEN m.doc_id % 53 = 5 THEN 'bad_magic'
                   WHEN m.doc_id = mx.last_id AND m.shard % 5 = 2 THEN 'truncated'
                   WHEN m.doc_id % 13 = 3 THEN 'crc_mismatch'
                   WHEN m.doc_id % 13 = 7 THEN 'length_mismatch'
                   ELSE 'ok' END AS planted
          FROM m JOIN mx ON mx.shard = m.shard),
        sync AS (
          SELECT shard, MIN(doc_id) AS first_bad
          FROM cls WHERE planted = 'bad_magic' GROUP BY shard),
        fin AS (
          SELECT c.len,
                 CASE WHEN s.first_bad IS NOT NULL AND c.doc_id > s.first_bad
                      THEN 'skipped_sync_loss' ELSE c.planted END AS status
          FROM cls c LEFT JOIN sync s ON s.shard = c.shard)
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN status = 'ok' THEN len ELSE 0 END)
                 AS BIGINT) AS chars_recovered
        FROM fin GROUP BY status ORDER BY status
      """.trim),
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), col("text"),
            expr("doc_id div 16").as("shard"))
        val shards = docs.groupBy(col("shard"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
            .as("members"))
        val rdd = shards.rdd.mapPartitions { rows =>
          rows.flatMap { r =>
            val shard = r.getLong(0)
            val members = r.getSeq[Row](1)
              .map(m => (m.getLong(0), m.getString(1)))
            val lastId = members.last._1
            val blob = new java.io.ByteArrayOutputStream()
            members.foreach { case (id, text) =>
              val cls = id % 13
              val name = if (cls == 11) Some(s"m$id") else None
              var b = GzipCodec.encodeMember(
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8), name)
              if (cls == 3) b(b.length - 8) = (b(b.length - 8) ^ 0x01).toByte
              if (cls == 7) b(b.length - 4) = (b(b.length - 4) ^ 0x01).toByte
              if (id % 53 == 5) b(0) = 'X'.toByte
              if (id == lastId && shard % 5 == 2) b = b.dropRight(6)
              blob.write(b, 0, b.length)
            }
            val walked = GzipCodec.walk(blob.toByteArray, members.size)
            members.indices.map { i =>
              if (i < walked.size) {
                val (st, data) = walked(i)
                val chars =
                  if (st == "ok") {
                    val t = new String(data,
                      java.nio.charset.StandardCharsets.UTF_8)
                    t.codePointCount(0, t.length).toLong
                  } else 0L
                Row(st, chars)
              } else Row("skipped_sync_loss", 0L)
            }
          }
        }
        s.createDataFrame(rdd, rowSchema)
          .groupBy(col("status"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            sum(col("chars")).as("chars_recovered"))
          .orderBy(col("status"))
      }))
}

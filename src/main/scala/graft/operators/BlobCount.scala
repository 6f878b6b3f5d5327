package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connected-component blob detection over REAL decoded BMP pixels —
  * the classic binary-image labeling step (dark mask: luminance
  * r+g+b < 384, 4-connectivity): per image, the dark-pixel count,
  * number of blobs, and largest blob size. The shape feature that
  * separates text scans / line art / noise in an image triage gate.
  *
  * The Spark side labels each image with a row-local union–find over
  * the parsed raster (images are small and never shuffle — CC within
  * an image is embarrassingly local); the oracle reproduces the same
  * blobs with a recursive transitive-closure walk over the adjacency
  * relation of formula-side pixels. A decode bug (stride, row order)
  * rewires adjacency and changes blob counts.
  *
  * Determinism: pure integer labeling; the mask threshold is an exact
  * integer predicate.
  *
  * Scale: a pure map stage (per-image union–find is O(px·α)) + one
  * orderBy; nothing crosses partitions until the final sort.
  */
object BlobCount {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_dark", LongType),
    StructField("n_blobs", LongType),
    StructField("largest_blob", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_blob_count", {
        def h(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
          WITH RECURSIVE g AS (
            SELECT doc_id,
                   CAST(8 + doc_id % 9 AS BIGINT) AS w,
                   CAST(4 + doc_id % 5 AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, w, h, UNNEST(range(0, w)) AS x FROM g),
          ps AS (SELECT doc_id, w, x, UNNEST(range(0, h)) AS y FROM xs),
          px AS (
            SELECT doc_id, w, x, y, y * w + x AS pid,
                   CAST(${h(0)} % 256 + ${h(1)} % 256 + ${h(2)} % 256
                     AS BIGINT) AS lum
            FROM ps),
          dark AS (SELECT doc_id, x, y, pid FROM px WHERE lum < 384),
          e0 AS (
            SELECT a.doc_id, a.pid AS u, b.pid AS v
            FROM dark a JOIN dark b
              ON b.doc_id = a.doc_id
             AND ((b.x = a.x + 1 AND b.y = a.y)
               OR (b.x = a.x AND b.y = a.y + 1))),
          edges AS (SELECT doc_id, u, v FROM e0
                    UNION ALL SELECT doc_id, v, u FROM e0),
          walk(doc_id, u, v) AS (
            SELECT doc_id, u, v FROM edges
            UNION
            SELECT w.doc_id, w.u, e.v
            FROM walk w JOIN edges e ON e.doc_id = w.doc_id AND e.u = w.v),
          mins AS (
            SELECT d.doc_id, d.pid,
                   LEAST(d.pid, COALESCE(MIN(w.v), d.pid)) AS label
            FROM dark d LEFT JOIN walk w
              ON w.doc_id = d.doc_id AND w.u = d.pid
            GROUP BY d.doc_id, d.pid),
          blobs AS (
            SELECT doc_id, label, COUNT(*) AS sz
            FROM mins GROUP BY doc_id, label)
          SELECT g.doc_id,
                 CAST(COALESCE(SUM(b.sz), 0) AS BIGINT) AS n_dark,
                 CAST(COUNT(b.label) AS BIGINT) AS n_blobs,
                 CAST(COALESCE(MAX(b.sz), 0) AS BIGINT) AS largest_blob
          FROM g LEFT JOIN blobs b ON b.doc_id = g.doc_id
          GROUP BY g.doc_id
          ORDER BY g.doc_id
        """.trim)
      },
      (s, d) => {
        import BmpMedia._
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
            val w = bmp.width; val h = bmp.height
            val dark = Array.tabulate(w * h) { i =>
              val lum = (bmp.rgb(3 * i) & 0xff) + (bmp.rgb(3 * i + 1) & 0xff) +
                (bmp.rgb(3 * i + 2) & 0xff)
              lum < 384
            }
            // union-find over the dark mask, 4-connectivity
            val parent = Array.tabulate(w * h)(identity)
            def find(a: Int): Int = {
              var x = a
              while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
              x
            }
            def union(a: Int, b: Int): Unit = {
              val (ra, rb) = (find(a), find(b))
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
            }
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val i = y * w + x
                if (dark(i)) {
                  if (x + 1 < w && dark(i + 1)) union(i, i + 1)
                  if (y + 1 < h && dark(i + w)) union(i, i + w)
                }
                x += 1
              }
              y += 1
            }
            val sizes = scala.collection.mutable.Map.empty[Int, Long]
            var i = 0; var nDark = 0L
            while (i < w * h) {
              if (dark(i)) {
                nDark += 1
                val r0 = find(i)
                sizes(r0) = sizes.getOrElse(r0, 0L) + 1L
              }
              i += 1
            }
            Row(id, nDark, sizes.size.toLong,
              if (sizes.isEmpty) 0L else sizes.values.max)
          }
        }
        s.createDataFrame(rdd, outSchema).orderBy(col("doc_id"))
      }))
}

package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Count sketch (Charikar, Chen & Farach-Colton, ICALP'02): the
  * SIGNED cousin of sk_countmin — each of 3 rows hashes a key to one
  * of 256 buckets AND a ±1 sign, so collisions cancel in expectation
  * and the median-of-rows point estimate is UNBIASED (count-min only
  * overestimates). Estimates for the 10 busiest users are reported
  * against their exact counts with errors — the two sketches side by
  * side is how you choose between "never underestimate" (CM) and
  * "unbiased" (CS) semantics for a freq-cap or hot-key detector.
  *
  * Determinism: buckets and signs come from disjoint portable
  * universal hashes; sketch cells are exact integer sums; the
  * median-of-3 is an exact integer order statistic.
  *
  * Scale: the sketch is 3×256 mergeable counters built in ONE
  * aggregate; probing joins the 10-key list against 3 cells each.
  */
object CountSketch {

  private val depth = 3
  private val width = 256

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk_count_sketch", {
        val h = PortableHash.sqlH32("CAST(user_id AS VARCHAR)")
        def pos(i: Int) = s"(${PortableHash.sqlUhash(h, i)} % $width)"
        def sgn(i: Int) =
          s"(CAST(${PortableHash.sqlUhash(h, i + 8)} % 2 AS BIGINT) * 2 - 1)"
        val ent = (0 until depth).map { i =>
          s"SELECT user_id, $i AS d, ${pos(i)} AS p, ${sgn(i)} AS sg FROM events"
        }.mkString(" UNION ALL ")
        Some(s"""
        WITH ent AS ($ent),
        cells AS (
          SELECT d, p, SUM(sg) AS c FROM ent GROUP BY d, p),
        exact AS (
          SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
          ORDER BY n DESC, user_id LIMIT 10),
        est AS (
          SELECT e.user_id, e.n, ent2.d,
                 MAX(cells.c * ent2.sg) AS point
          FROM exact e
          JOIN (SELECT DISTINCT user_id, d, p, sg FROM ent) ent2
            ON ent2.user_id = e.user_id
          JOIN cells ON cells.d = ent2.d AND cells.p = ent2.p
          GROUP BY e.user_id, e.n, ent2.d),
        med AS (
          SELECT user_id, n, point,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY point) AS rk
          FROM est)
        SELECT user_id, CAST(n AS BIGINT) AS exact_count,
               CAST(point AS BIGINT) AS cs_estimate,
               CAST(point - n AS BIGINT) AS error
        FROM med WHERE rk = 2
        ORDER BY exact_count DESC, user_id
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h = PortableHash.h32($"user_id".cast("string"))
        val ev = events(s, d)
        val ent = (0 until depth).map { i =>
          ev.select($"user_id", lit(i).as("d"),
            (PortableHash.uhash(h, i) % width).as("p"),
            (PortableHash.uhash(h, i + 8) % 2 * 2 - 1).as("sg"))
        }.reduce(_ unionByName _)
        val cells = ent.groupBy($"d".as("c_d"), $"p".as("c_p"))
          .agg(sum($"sg").as("c"))
        val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"user_id").limit(10)
        val keyCells = ent.select($"user_id", $"d", $"p", $"sg").distinct()
        val est = exact
          .join(keyCells, "user_id")
          .join(cells, $"d" === $"c_d" && $"p" === $"c_p")
          .groupBy($"user_id", $"n", $"d")
          .agg(max($"c" * $"sg").as("point"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"point")
        est.withColumn("rk", row_number().over(w))
          .filter($"rk" === 2)
          .select($"user_id", $"n".cast("long").as("exact_count"),
            $"point".cast("long").as("cs_estimate"),
            ($"point" - $"n").cast("long").as("error"))
          .orderBy($"exact_count".desc, $"user_id")
      }))
}

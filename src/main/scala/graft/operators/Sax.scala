package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX — Symbolic Aggregate approXimation (Lin, Keogh et al., DMKD
  * 2007) of the hourly event series: z-normalize, Piecewise Aggregate
  * Approximation into 4-hour segments, map each segment mean to a
  * 4-letter alphabet at the standard Gaussian breakpoints (−0.6745,
  * 0, 0.6745 — the quartiles), slide a 3-segment window into "words",
  * and count word frequencies. The top recurring words per type are
  * its motifs — the discrete, index-able cousin of ts_matrix_profile
  * (which finds one best motif; SAX finds the recurring vocabulary).
  *
  * Missing hours are true zero counts: μ and σ are computed over the
  * full 720-hour calendar (n is the literal grid size, sums are over
  * present rows) so sparsity can't bias the normalization.
  *
  * Determinism: counts are integers; μ, σ, and each PAA mean are the
  * same fixed-order double expressions in both engines, so symbol
  * boundaries branch identically; words are strings; ranking is
  * (count DESC, word ASC).
  *
  * Scale: one hash aggregate to (type, segment) — calendar-bounded —
  * then keyed windows over ≤180 segments per type. Only the first
  * aggregate touches event volume.
  */
object Sax {

  private val H = 720
  private val seg = 4
  // Gaussian quartile breakpoints for a 4-symbol alphabet
  private val b1 = "-0.6745"
  private val b3 = "0.6745"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ts_sax_motifs",
      Some(s"""
        WITH hourly AS (
          SELECT event_type,
                 (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                   // 3600000000 AS h,
                 COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type,
                 CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) / $H AS mu,
                 sqrt((CAST($H AS DOUBLE) * SUM(CAST(c AS HUGEINT) * c)
                       - CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE)
                         * SUM(CAST(c AS HUGEINT)))
                      / (CAST($H AS DOUBLE) * $H)) AS sd
          FROM hourly GROUP BY event_type),
        paa AS (
          SELECT event_type, h // $seg AS s,
                 CAST(SUM(c) AS DOUBLE) / $seg AS p
          FROM hourly GROUP BY 1, 2),
        sym AS (
          SELECT p.event_type, p.s,
                 CASE WHEN p.p < st.mu + CAST($b1 AS DOUBLE) * st.sd THEN 'a'
                      WHEN p.p < st.mu THEN 'b'
                      WHEN p.p < st.mu + CAST($b3 AS DOUBLE) * st.sd THEN 'c'
                      ELSE 'd' END AS y
          FROM paa p JOIN st ON st.event_type = p.event_type),
        words AS (
          SELECT event_type, s,
                 y || lead(y, 1) OVER (PARTITION BY event_type ORDER BY s)
                   || lead(y, 2) OVER (PARTITION BY event_type ORDER BY s) AS w
          FROM sym),
        wc AS (
          SELECT event_type, w, COUNT(*) AS cnt
          FROM words WHERE w IS NOT NULL AND length(w) = 3
          GROUP BY event_type, w),
        ranked AS (
          SELECT event_type, w, cnt,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cnt DESC, w) AS rank
          FROM wc)
        SELECT event_type, CAST(rank AS BIGINT) AS rank, w AS word,
               CAST(cnt AS BIGINT) AS cnt
        FROM ranked WHERE rank <= 5
        ORDER BY event_type, rank
      """.trim),
      (s, d) => {
        import s.implicits._
        val hourly = events(s, d)
          .select($"event_type",
            expr("(unix_micros(ts) - 1704067200000000) DIV 3600000000").as("h"))
          .groupBy($"event_type", $"h").agg(count(lit(1)).as("c"))
        val hug = $"c".cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val st = hourly.groupBy($"event_type".as("st_et"))
          .agg((sum(hug).cast("double") / H).as("mu"),
            sqrt((lit(H.toDouble) * sum(hug * $"c")
              - sum(hug).cast("double") * sum(hug))
              / (lit(H.toDouble) * H)).as("sd"))
        val paa = hourly.groupBy($"event_type", expr(s"h div $seg").as("s"))
          .agg((sum($"c").cast("double") / seg).as("p"))
        val sym = paa.join(st, $"event_type" === $"st_et")
          .select($"event_type", $"s",
            when($"p" < $"mu" + lit(b1.toDouble) * $"sd", "a")
              .when($"p" < $"mu", "b")
              .when($"p" < $"mu" + lit(b3.toDouble) * $"sd", "c")
              .otherwise("d").as("y"))
        val w = Window.partitionBy($"event_type").orderBy($"s")
        val words = sym.select($"event_type", $"s",
          concat($"y", lead($"y", 1).over(w), lead($"y", 2).over(w)).as("w"))
        val wc = words.filter($"w".isNotNull && length($"w") === 3)
          .groupBy($"event_type", $"w").agg(count(lit(1)).as("cnt"))
        val rw = Window.partitionBy($"event_type")
          .orderBy($"cnt".desc, $"w".asc)
        wc.withColumn("rank", row_number().over(rw))
          .filter($"rank" <= 5)
          .select($"event_type", $"rank".cast("long").as("rank"),
            $"w".as("word"), $"cnt".cast("long").as("cnt"))
          .orderBy($"event_type", $"rank")
      }))
}

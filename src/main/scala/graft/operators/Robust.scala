package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Robust outlier detection and code-content profiling.
  *
  * ev_anomaly_mad is the median/MAD twin of ev_anomaly's mean/stddev
  * z-score: a single wild day inflates a stddev enough to hide itself
  * (masking), while the median absolute deviation moves by at most one
  * rank — the robust detector is the one a data-quality monitor
  * actually wants. Fully INTEGER arithmetic: cent-scaled daily totals,
  * exact lower-median rank selections, and an integer 3·MAD threshold
  * — no float anywhere until the final reporting division.
  *
  * ta_code_detect profiles code-vs-prose content per source (symbol
  * density, digit density) — the mixture-composition input when code
  * and prose need different curation tracks. Integer character counts
  * from global regex strips; ratios are per-row IEEE divisions snapped
  * to the 1e-9 grid before the DECIMAL mean.
  */
object Robust {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_anomaly_mad",
      Some("""
        WITH daily AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS z
          FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
        rz AS (
          SELECT event_type, day, z,
                 row_number() OVER (PARTITION BY event_type ORDER BY z, day) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM daily),
        med AS (
          SELECT event_type, z AS m FROM rz WHERE rk = (n + 1) // 2),
        dev AS (
          SELECT d.event_type, d.day, d.z, abs(d.z - m.m) AS dv, m.m
          FROM daily d JOIN med m ON m.event_type = d.event_type),
        rd AS (
          SELECT event_type, day, z, dv, m,
                 row_number() OVER (PARTITION BY event_type ORDER BY dv, day) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev),
        mad AS (
          SELECT event_type, dv AS mad FROM rd WHERE rk = (n + 1) // 2)
        SELECT d.event_type, d.day,
               d.z / 100.0 AS value,
               d.m / 100.0 AS median_value,
               CASE WHEN md.mad > 0 THEN CAST(d.dv AS DOUBLE) / md.mad END AS dev_ratio
        FROM dev d JOIN mad md ON md.event_type = d.event_type
        WHERE d.dv > 3 * md.mad
        ORDER BY d.event_type, d.day
      """.trim),
      (s, d) => {
        import s.implicits._
        val daily = events(s, d)
          .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100).cast("long").as("z"))
          .persist()
        def lowerMedian(df: org.apache.spark.sql.DataFrame, c: String, out: String) = {
          val w = Window.partitionBy($"event_type")
          df.withColumn("rk", row_number().over(w.orderBy(col(c), $"day")))
            .withColumn("n", count(lit(1)).over(w))
            .filter($"rk" === floor(($"n" + 1) / 2).cast("long"))
            .select($"event_type", col(c).as(out))
        }
        val med = lowerMedian(daily, "z", "m")
        val dev = daily.join(med, "event_type")
          .withColumn("dv", abs($"z" - $"m"))
        val mad = lowerMedian(dev, "dv", "mad")
        dev.join(mad, "event_type")
          .filter($"dv" > lit(3) * $"mad")
          .select($"event_type", $"day",
            ($"z" / 100.0).as("value"),
            ($"m" / 100.0).as("median_value"),
            when($"mad" > 0, $"dv".cast("double") / $"mad").as("dev_ratio"))
          .orderBy($"event_type", $"day")
      }),

    QueryDef(
      "ta_code_detect",
      Some("""
        WITH f AS (
          SELECT source,
                 length(text) AS len,
                 length(text) - length(regexp_replace(text, '[{}();=<>\\[\\]]', '', 'g')) AS n_sym,
                 length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_dig
          FROM documents WHERE length(text) > 0),
        r AS (
          SELECT source, len, n_sym, n_dig,
                 n_sym * 1.0 / len AS sym_ratio,
                 n_dig * 1.0 / len AS dig_ratio
          FROM f)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE sym_ratio >= 0.03) AS BIGINT) AS n_codey,
               CAST(SUM(CAST(floor(sym_ratio * 1000000000 + 0.5) / 1000000000 AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) AS mean_sym_ratio,
               CAST(SUM(CAST(floor(dig_ratio * 1000000000 + 0.5) / 1000000000 AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) AS mean_dig_ratio
        FROM r
        GROUP BY source
        ORDER BY source
      """.trim),
      (s, d) => {
        import s.implicits._
        def snap9(c: org.apache.spark.sql.Column) =
          floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
        val f = documents(s, d)
          .filter(length($"text") > 0)
          .select($"source", length($"text").as("len"),
            (length($"text") - length(regexp_replace($"text", "[{}();=<>\\[\\]]", "")))
              .as("n_sym"),
            (length($"text") - length(regexp_replace($"text", "[0-9]", "")))
              .as("n_dig"))
        val r = f.select($"source",
          ($"n_sym" * lit(1.0) / $"len").as("sym_ratio"),
          ($"n_dig" * lit(1.0) / $"len").as("dig_ratio"))
        r.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            count(when($"sym_ratio" >= 0.03, 1)).as("n_codey"),
            (sum(snap9($"sym_ratio").cast(DecimalType(28, 12))).cast("double")
              / count(lit(1))).as("mean_sym_ratio"),
            (sum(snap9($"dig_ratio").cast(DecimalType(28, 12))).cast("double")
              / count(lit(1))).as("mean_dig_ratio"))
          .select($"source", $"n_docs", $"n_codey",
            $"mean_sym_ratio", $"mean_dig_ratio")
          .orderBy($"source")
      }))
}

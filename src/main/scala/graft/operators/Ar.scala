package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Yule–Walker AR(2) fit per event type over the dense hourly count
  * grid — the classical linear model behind "is this series momentum
  * or mean-reversion" readouts (Box–Jenkins identification step).
  *
  * Determinism: the grid is the FULL 720-hour range (zeros included —
  * the 30-day window is a fixed property of the generator, asserted in
  * the dataflow), so N is a constant and the autocovariances can be
  * integerized exactly: with S = Σx, the lag-k comoment
  * N²·Σ(x_t−μ)(x_{t+k}−μ) = Σ (N·x_t − S)(N·x_{t+k} − S) is a sum of
  * exact integer products, routed through DECIMAL(38,0) so it neither
  * overflows at scale nor depends on partitioning. r₁, r₂ and the
  * Yule–Walker coefficients φ₁ = r₁(1−r₂)/(1−r₁²),
  * φ₂ = (r₂−r₁²)/(1−r₁²) are fixed-order double expressions of those
  * exact integers, written identically in both engines.
  *
  * Scale: one count aggregate (map-side combined), a 5×720-row grid
  * join, one lead window per type — per-type state is three running
  * sums; nothing driver-side. The comoments use the SAME lag columns
  * from ONE window sort (lead 1 and lead 2 share the ordering).
  */
object Ar {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ts_ar2",
      Some("""
        WITH cnt AS (
          SELECT event_type,
                 (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000 AS h,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        grid AS (
          SELECT t.event_type, g.h, COALESCE(c.x, 0) AS x
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN (SELECT unnest(range(0, 720)) AS h) g
          LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = g.h),
        st AS (SELECT event_type, SUM(x) AS s FROM grid GROUP BY 1),
        ld AS (
          SELECT event_type, x,
                 lead(x, 1) OVER (PARTITION BY event_type ORDER BY h) AS x1,
                 lead(x, 2) OVER (PARTITION BY event_type ORDER BY h) AS x2
          FROM grid),
        c AS (
          SELECT l.event_type,
                 CAST(SUM(CAST(720 * x - s AS DECIMAL(19,0)) * CAST(720 * x - s AS DECIMAL(19,0))) AS DOUBLE) AS c0,
                 CAST(SUM(CASE WHEN x1 IS NOT NULL
                               THEN CAST(720 * x - s AS DECIMAL(19,0)) * CAST(720 * x1 - s AS DECIMAL(19,0)) END) AS DOUBLE) AS c1,
                 CAST(SUM(CASE WHEN x2 IS NOT NULL
                               THEN CAST(720 * x - s AS DECIMAL(19,0)) * CAST(720 * x2 - s AS DECIMAL(19,0)) END) AS DOUBLE) AS c2
          FROM ld l JOIN st USING (event_type)
          GROUP BY l.event_type)
        SELECT event_type, CAST(720 AS BIGINT) AS n_hours, c0, c1, c2,
               c1 / c0 AS r1, c2 / c0 AS r2,
               (c1 / c0) * (1.0 - c2 / c0) / (1.0 - (c1 / c0) * (c1 / c0)) AS phi1,
               (c2 / c0 - (c1 / c0) * (c1 / c0)) / (1.0 - (c1 / c0) * (c1 / c0)) AS phi2
        FROM c
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        // 1704067200000000 = epoch_us('2024-01-01 00:00:00' UTC)
        val cnt = events(s, d)
          .select($"event_type",
            expr(s"(unix_micros(ts) - 1704067200000000) DIV 3600000000").as("h"))
          .groupBy($"event_type", $"h").agg(count(lit(1)).as("x"))
        // dataflow-level assertion of the fixed generator window the
        // constant N depends on: any hour outside [0, 720) is a
        // generator change, not data to silently fold in
        val guarded = cnt.withColumn("x",
          when($"h" >= 0 && $"h" < 720, $"x")
            .otherwise(raise_error(concat(
              lit("ts_ar2: hour index out of the fixed 720-hour window: "),
              $"h".cast("string"))).cast("long")))
        val grid = events(s, d).select($"event_type").distinct()
          .crossJoin(s.range(0, 720).select($"id".as("h")))
          .join(guarded, Seq("event_type", "h"), "left")
          .select($"event_type", $"h", coalesce($"x", lit(0)).as("x"))
        val st = grid.groupBy($"event_type").agg(sum($"x").as("s"))
        val w = Window.partitionBy($"event_type").orderBy($"h")
        val ld = grid
          .withColumn("x1", lead($"x", 1).over(w))
          .withColumn("x2", lead($"x", 2).over(w))
        def dev(c: org.apache.spark.sql.Column) =
          (lit(720) * c - $"s").cast(DecimalType(19, 0))
        val c = ld.join(st, "event_type")
          .groupBy($"event_type")
          .agg(
            sum(dev($"x") * dev($"x")).cast("double").as("c0"),
            sum(when($"x1".isNotNull, dev($"x") * dev($"x1"))).cast("double").as("c1"),
            sum(when($"x2".isNotNull, dev($"x") * dev($"x2"))).cast("double").as("c2"))
        val r1 = $"c1" / $"c0"
        val r2 = $"c2" / $"c0"
        c.select($"event_type", lit(720L).as("n_hours"), $"c0", $"c1", $"c2",
          r1.as("r1"), r2.as("r2"),
          (r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1)).as("phi1"),
          ((r2 - r1 * r1) / (lit(1.0) - r1 * r1)).as("phi2"))
          .orderBy($"event_type")
      }))
}

package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Group-sequential A/B monitoring (Pocock 1977; O'Brien & Fleming
  * 1979): the peeking-safe readout an experimentation platform runs
  * daily. Five interim looks over the 30-day event window; at look k
  * the pooled two-proportion z for "user converted (≥1 purchase)" is
  * compared against the O'Brien–Fleming-style boundary
  * c / sqrt(k/K) (c = 2.0413 for K = 5, α = 0.05 two-sided — a
  * published constant, quoted as a literal, not computed), which
  * spends almost no alpha early and relaxes to ~nominal at the final
  * look. Output is the full monitoring table: per-look arm sizes,
  * converters, z, boundary, crossed flag.
  *
  * Determinism: the only non-rational operation is sqrt, which IEEE
  * 754 requires correctly rounded in both engines (unlike exp/ln —
  * which is why this is the OBF table, not the mixture-SPRT e-value:
  * same decision structure, no transcendental hazard). Counts are
  * exact conditional sums; z is one fixed-shape double expression,
  * snap9'd.
  *
  * Scale: one groupBy(user) for (arm, first activity day, first
  * conversion day), then ONE 20-conditional-sum aggregate to a single
  * row, unpivoted to 5 look rows driver-free. No look×user join, no
  * grid broadcast — cumulative-at-look counts are conditional sums,
  * so the plan is two hash aggregates end to end at any user count.
  */
object Sequential {

  private val looks = Seq(1, 2, 3, 4, 5)
  private val lookDay = Map(1 -> 5L, 2 -> 11L, 3 -> 17L, 4 -> 23L, 5 -> 29L)
  private val c = "2.0413"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_sequential_test", {
        val condSums = looks.map { k =>
          val d = lookDay(k)
          s"""SUM(CASE WHEN arm = 0 AND d0 <= $d THEN 1 ELSE 0 END) AS na$k,
              SUM(CASE WHEN arm = 1 AND d0 <= $d THEN 1 ELSE 0 END) AS nb$k,
              SUM(CASE WHEN arm = 0 AND dc <= $d THEN 1 ELSE 0 END) AS ca$k,
              SUM(CASE WHEN arm = 1 AND dc <= $d THEN 1 ELSE 0 END) AS cb$k"""
        }.mkString(",\n")
        val lookRows = looks.map { k =>
          s"SELECT $k AS look, ${lookDay(k)} AS day, na$k AS na, nb$k AS nb, ca$k AS ca, cb$k AS cb FROM m"
        }.mkString("\nUNION ALL\n")
        Some(s"""
          WITH u AS (
            SELECT user_id, user_id % 2 AS arm,
                   MIN((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 86400000000) AS d0,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 86400000000
                            END) AS dc
            FROM events GROUP BY 1, 2),
          m AS (SELECT $condSums FROM u),
          t AS ($lookRows),
          g AS (
            -- NULLIF-guarded: empty arms or a zero/degenerate pooled
            -- rate (se = 0) yield NULL z, not an engine-dependent
            -- division failure
            SELECT look, day, na, nb, ca, cb,
                   ca * 1.0 / NULLIF(na, 0) - cb * 1.0 / NULLIF(nb, 0) AS diff,
                   sqrt(((ca + cb) * 1.0 / (na + nb)) * (1 - (ca + cb) * 1.0 / (na + nb))
                        * (1.0 / NULLIF(na, 0) + 1.0 / NULLIF(nb, 0))) AS se
            FROM t)
          SELECT CAST(look AS BIGINT) AS look, CAST(day AS BIGINT) AS day,
                 CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                 CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
                 ${det.sqlSnap9("diff / NULLIF(se, 0)")} AS z,
                 ${det.sqlSnap9(s"$c / sqrt(look / 5.0)")} AS boundary,
                 abs(${det.sqlSnap9("diff / NULLIF(se, 0)")}) > ${det.sqlSnap9(s"$c / sqrt(look / 5.0)")} AS crossed
          FROM g
          ORDER BY look
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val dayExpr = expr(
          "(unix_micros(ts) - 1704067200000000) DIV 86400000000")
        val u = events(s, d)
          .select($"user_id", ($"user_id" % 2).as("arm"),
            dayExpr.as("day"), $"event_type")
          .groupBy($"user_id", $"arm")
          .agg(min($"day").as("d0"),
            min(when($"event_type" === "purchase", $"day")).as("dc"))
        lookTable(u)
      }))

  /** The monitoring table from per-user (arm, d0 = first activity day,
    * dc = first conversion day) state — shared verbatim by the batch
    * query above and [[graft.streaming.Streams.sequentialMonitor]], so
    * the streaming twin cannot drift from the batch semantics. */
  def lookTable(u: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val condSums = looks.flatMap { k =>
      val dd = lookDay(k)
      Seq(
        sum(when(col("arm") === 0 && col("d0") <= dd, 1).otherwise(0)).as(s"na$k"),
        sum(when(col("arm") === 1 && col("d0") <= dd, 1).otherwise(0)).as(s"nb$k"),
        sum(when(col("arm") === 0 && col("dc") <= dd, 1).otherwise(0)).as(s"ca$k"),
        sum(when(col("arm") === 1 && col("dc") <= dd, 1).otherwise(0)).as(s"cb$k"))
    }
    val m = u.agg(condSums.head, condSums.tail: _*)
    val t = looks.map { k =>
      m.select(lit(k.toLong).as("look"), lit(lookDay(k)).as("day"),
        col(s"na$k").as("na"), col(s"nb$k").as("nb"),
        col(s"ca$k").as("ca"), col(s"cb$k").as("cb"))
    }.reduce(_ unionByName _)
    def nz(c0: org.apache.spark.sql.Column) =
      when(c0 === 0, lit(null)).otherwise(c0)
    val pa = col("ca") * lit(1.0) / nz(col("na"))
    val pb = col("cb") * lit(1.0) / nz(col("nb"))
    val pp = (col("ca") + col("cb")) * lit(1.0) / (col("na") + col("nb"))
    val se = sqrt(pp * (lit(1) - pp)
      * (lit(1.0) / nz(col("na")) + lit(1.0) / nz(col("nb"))))
    val z = det.snap9((pa - pb) / nz(se))
    val boundary = det.snap9(lit(c.toDouble) / sqrt(col("look") / lit(5.0)))
    t.select(col("look").cast("long").as("look"),
        col("day").cast("long").as("day"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("ca").cast("long").as("conv_a"), col("cb").cast("long").as("conv_b"),
        z.as("z"), boundary.as("boundary"),
        (abs(z) > boundary).as("crossed"))
      .orderBy(col("look"))
  }
}

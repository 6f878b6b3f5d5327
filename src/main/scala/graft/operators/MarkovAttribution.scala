package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2016) — the
  * data-driven alternative to ev_attribution's last-touch rule: model
  * each user's pre-conversion event sequence as a first-order Markov
  * chain (start → channels → conv/null absorbing states), then credit
  * each channel by its REMOVAL EFFECT — how much the start-state
  * conversion probability drops when paths through that channel are
  * voided.
  *
  * Conversion probability is the defined **30-step absorption
  * probability** (fixed iteration count, identical in both engines;
  * the transient mass left after 30 steps is < 2e-4 on this chain).
  * Each iteration step is v'(a) = Σ_b p(a,b)·v(b) with conv ≡ 1,
  * null ≡ 0, and (under removal of channel c) c ≡ 0.
  *
  * Determinism: transition probabilities are single divisions of exact
  * counts; every product term is snapped to the 1e-9 grid
  * ([[graft.det.snap9]]) and summed EXACTLY in scale-9 units, so the
  * 150 chained float steps (5 chains × 30 iterations) are bit-equal
  * across engines by induction — the oracle unrolls them as CTEs,
  * Spark folds them over the COLLECTED transition table, which is
  * bounded by (states+start)² ≤ 49 rows however large the event log
  * (the bounded-model-state pattern the BPE trainer uses). The only
  * corpus-sized work is one ordered path scan and one (prev, state)
  * count aggregate.
  */
object MarkovAttribution {

  private val K = 30
  private val channels = Seq("click", "error", "signup", "view")

  /** One unrolled value-iteration chain; `removed` voids a channel. */
  private def sqlChain(tag: String, removed: Option[String]): String = {
    def term(k: Int): String = {
      val rm = removed.map(c => s"WHEN p.st = '$c' THEN CAST(0 AS DOUBLE)").getOrElse("")
      val prevVal =
        if (k == 1) "CAST(0 AS DOUBLE)"
        else "COALESCE(v.val, CAST(0 AS DOUBLE))"
      s"""CASE $rm WHEN p.st = 'conv' THEN CAST(1 AS DOUBLE)
                   WHEN p.st = 'null' THEN CAST(0 AS DOUBLE)
                   ELSE $prevVal END"""
    }
    (1 to K).map { k =>
      val join = if (k == 1) "" else s"LEFT JOIN v_${tag}_${k - 1} v ON v.s = p.st"
      s"""v_${tag}_$k AS MATERIALIZED (
            SELECT p.prev AS s,
                   CAST(SUM(CAST(round(p.p * ${term(k)} * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) AS val
            FROM p $join
            GROUP BY p.prev)"""
    }.mkString(",\n        ")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_attribution_markov",
      Some(s"""
        WITH fp AS (
          SELECT user_id, MIN(event_id) AS pe
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        seq AS (
          SELECT e.user_id, e.event_id,
                 CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type END AS st
          FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
          WHERE fp.pe IS NULL OR e.event_id <= fp.pe),
        tr0 AS (
          SELECT user_id, st,
                 COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY event_id), 'start') AS prev
          FROM seq),
        lastst AS (
          SELECT user_id, st FROM (
            SELECT user_id, st,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM seq) WHERE rn = 1),
        term AS (
          SELECT l.st AS prev, 'null' AS st
          FROM lastst l
          WHERE l.user_id NOT IN (SELECT user_id FROM fp)),
        trans AS (SELECT prev, st FROM tr0 UNION ALL SELECT prev, st FROM term),
        cnt AS (SELECT prev, st, COUNT(*) AS c FROM trans GROUP BY prev, st),
        tot AS (SELECT prev, SUM(c) AS n FROM cnt GROUP BY prev),
        p AS MATERIALIZED (SELECT c.prev, c.st, c.c * 1.0 / t.n AS p FROM cnt c JOIN tot t USING (prev)),
        ${sqlChain("base", None)},
        ${channels.map(c => sqlChain(c, Some(c))).mkString(",\n        ")},
        base AS (SELECT val FROM v_base_$K WHERE s = 'start'),
        rem(channel, val) AS (
          ${channels.map(c => s"SELECT '$c', val FROM v_${c}_$K WHERE s = 'start'").mkString("\n          UNION ALL ")})
        SELECT rem.channel, base.val AS p_conv_base, rem.val AS p_conv_removed,
               1.0 - rem.val / base.val AS removal_effect
        FROM rem CROSS JOIN base
        ORDER BY rem.channel
      """.trim),
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
        val fp = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id").agg(min($"event_id").as("pe"))
        val seq0 = ev.join(fp, Seq("user_id"), "left")
          .filter($"pe".isNull || $"event_id" <= $"pe")
          .select($"user_id", $"event_id", $"pe",
            when($"event_type" === "purchase", "conv").otherwise($"event_type").as("st"))
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        val tr0 = seq0.select($"user_id", $"st",
          coalesce(lag($"st", 1).over(w), lit("start")).as("prev"))
        val term = seq0
          .withColumn("rn", row_number().over(
            Window.partitionBy($"user_id").orderBy($"event_id".desc)))
          .filter($"rn" === 1 && $"pe".isNull)
          .select($"st".as("prev"), lit("null").as("st"))
        val cnt = tr0.select($"prev", $"st").union(term)
          .groupBy($"prev", $"st").agg(count(lit(1)).as("c"))
          // bounded: (channels + start + conv + null)² keys at most
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val totals = cnt.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        // p is the double division of exact counts — identical in both
        // engines; terms snap to the 1e-9 grid and accumulate EXACTLY
        // in scale-9 long units, so each iteration's values match the
        // oracle's decimal sums bit-for-bit by induction
        val p = cnt.map { case (prev, st, c) => (prev, st, c.toDouble / totals(prev)) }
        def snapUnits(x: Double): Long =
          JBigDecimal.valueOf(x * 1e9).setScale(0, RoundingMode.HALF_UP).longValueExact()
        def iterate(removed: Option[String]): Double = {
          var v = Map.empty[String, Double]
          for (_ <- 1 to K) {
            v = p.groupBy(_._1).map { case (prev, rows) =>
              val units = rows.map { case (_, st, pr) =>
                val x =
                  if (removed.contains(st)) 0.0
                  else if (st == "conv") 1.0
                  else if (st == "null") 0.0
                  else v.getOrElse(st, 0.0)
                snapUnits(pr * x)
              }.sum
              prev -> JBigDecimal.valueOf(units, 9).doubleValue()
            }
          }
          v.getOrElse("start", 0.0)
        }
        val base = iterate(None)
        val rows = channels.map { c =>
          val r = iterate(Some(c))
          (c, base, r, 1.0 - r / base)
        }
        rows.toDF("channel", "p_conv_base", "p_conv_removed", "removal_effect")
          .orderBy($"channel")
      }))
}

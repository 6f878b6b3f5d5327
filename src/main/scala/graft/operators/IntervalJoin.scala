package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap self-join — the one join shape the equi/as-of/range
  * family doesn't cover: which sessions ran CONCURRENTLY with each
  * other (peak-concurrency ops readout). The scale technique is grid
  * bucketing: each session interval explodes into the day cells it
  * covers, candidate pairs come from a day-cell EQUI-join (never an
  * unbounded inequality join), the exact overlap predicate filters
  * inside the join, and a distinct collapses pairs that share several
  * cells. Cell granularity trades explode factor against bucket
  * population — the quadratic term is (per-cell count)², so the cell
  * should track the TYPICAL INTERVAL LENGTH: sessions are minutes to
  * a few hours, and hour cells explode ≈1.2× while day cells packed
  * ~25× more candidate pairs into each bucket (measured 7.8s → the
  * hour-cell plan at sf0.1; the overlap count is identical). The
  * oracle runs the direct inequality self-join instead — at its scale
  * that is its privilege; the Spark side must never.
  *
  * Sessionization is the ev_session_window 30-minute-gap recipe
  * verbatim; the readout is top-20 sessions by overlap count under a
  * (count, user, session) total order — TakeOrderedAndProject.
  */
object IntervalJoin {

  /** 30-minute-gap sessionization by event_id order: (user_id,
    * session_no, s, e) intervals. Factored so the streaming
    * concurrency monitor ([[graft.streaming.Streams.liveSessions]])
    * converges to EXACTLY this definition. */
  def sessionIntervals(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev
      .withColumn("t", unix_timestamp(col("ts")))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_t").isNull || col("t") - col("prev_t") > 1800, 1).otherwise(0))
      .withColumn("session_no",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("t")).as("s"), max(col("t")).as("e"))
  }

  /** Hour-cell-bucketed overlap counts over (user_id, session_no, s,
    * e) intervals: candidate pairs from a cell EQUI-join (never an
    * unbounded inequality join), exact overlap predicate inside the
    * join, distinct collapses multi-cell pairs. Shared by the batch
    * query and the streaming monitor's per-epoch readout. */
  def overlapCounts(iv0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // consumed three times (both join sides + readout)
    val iv = iv0.localCheckpoint()
    def cells(df: org.apache.spark.sql.DataFrame, p: String) = df.select(
      col("user_id").as(s"u$p"), col("session_no").as(s"n$p"),
      col("s").as(s"s$p"), col("e").as(s"e$p"),
      explode(sequence(col("s").divide(3600).cast("long"),
        col("e").divide(3600).cast("long"))).as("cell"))
    val pairs = cells(iv, "a").join(cells(iv, "b"), "cell")
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea") &&
        (col("ua") < col("ub") ||
          (col("ua") === col("ub") && col("na") < col("nb"))))
      .select(col("ua"), col("na"), col("ub"), col("nb"))
      // one pair per overlap, however many cells it spans
      .distinct()
    val cnt = pairs.select(col("ua").as("user_id"), col("na").as("session_no"))
      .union(pairs.select(col("ub"), col("nb")))
      .groupBy(col("user_id"), col("session_no")).agg(count(lit(1)).as("n"))
    iv.join(cnt, Seq("user_id", "session_no"), "left")
      .select(col("user_id").cast("long").as("user_id"),
        col("session_no").cast("long").as("session_no"),
        col("s").as("session_start"), col("e").as("session_end"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_overlaps"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "jx_interval_overlap",
      Some("""
        WITH ordered AS (
          SELECT user_id, event_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS t,
                 LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_t
          FROM events),
        flagged AS (
          SELECT user_id, event_id, t,
                 CASE WHEN prev_t IS NULL OR t - prev_t > 1800 THEN 1 ELSE 0 END AS is_new
          FROM ordered),
        sessions AS (
          SELECT user_id, event_id, t,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          FROM flagged),
        iv AS (
          SELECT user_id, session_no, MIN(t) AS s, MAX(t) AS e
          FROM sessions GROUP BY user_id, session_no),
        pairs AS (
          SELECT a.user_id AS ua, a.session_no AS sa,
                 b.user_id AS ub, b.session_no AS sb
          FROM iv a JOIN iv b
            ON a.s <= b.e AND b.s <= a.e
           AND (a.user_id < b.user_id
                OR (a.user_id = b.user_id AND a.session_no < b.session_no))),
        cnt AS (
          SELECT user_id, session_no, COUNT(*) AS n
          FROM (SELECT ua AS user_id, sa AS session_no FROM pairs
                UNION ALL SELECT ub, sb FROM pairs)
          GROUP BY user_id, session_no)
        SELECT CAST(iv.user_id AS BIGINT) AS user_id,
               CAST(iv.session_no AS BIGINT) AS session_no,
               iv.s AS session_start, iv.e AS session_end,
               CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_overlaps
        FROM iv LEFT JOIN cnt USING (user_id, session_no)
        ORDER BY n_overlaps DESC, user_id, session_no
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        overlapCounts(sessionIntervals(events(s, d)))
          .orderBy($"n_overlaps".desc, $"user_id", $"session_no")
          .limit(20)
      }))
}

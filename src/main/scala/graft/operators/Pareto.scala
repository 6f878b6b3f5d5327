package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** 2-D skyline (Pareto frontier) of users over (total spend, activity)
  * — the Börzsönyi et al. (ICDE 2001) SKYLINE operator: users no other
  * user weakly beats on both dimensions and strictly beats on one.
  * The segmentation primitive behind "best customers" views that a
  * single blended score hides.
  *
  * The oracle states the NOT-EXISTS dominance spec directly (the
  * O(n²) definition); the Spark side is the scale path — the
  * staircase algorithm: group to distinct spend levels (hash
  * aggregate), take each level's max activity, and keep the levels
  * whose max strictly exceeds the prefix max of all HIGHER spend
  * levels, computed with [[Pipeline.globalPrefixMax]] (range-sharded,
  * one long per shard of driver traffic — never a single-partition
  * window). Members of surviving levels at the level max are the
  * skyline; equal (spend, activity) twins are mutually non-dominating
  * and all kept.
  *
  * Determinism: both dimensions are exact integers (cent-scaled spend,
  * event counts).
  *
  * Scale: two hash aggregates + the sharded prefix pass over DISTINCT
  * spend levels + one semi-join back — linear dataflow; the O(n²)
  * spec never executes on the Spark side.
  */
object Pareto {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_pareto_users",
      Some("""
        WITH u AS (
          SELECT user_id,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS tv,
                 COUNT(*) AS ne
          FROM events GROUP BY user_id)
        SELECT u.user_id, u.tv AS total_cents, CAST(u.ne AS BIGINT) AS n_events
        FROM u
        WHERE NOT EXISTS (
          SELECT 1 FROM u v
          WHERE v.tv >= u.tv AND v.ne >= u.ne
            AND (v.tv > u.tv OR v.ne > u.ne))
        ORDER BY u.user_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id")
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100)
            .cast("long").as("tv"),
            count(lit(1)).as("ne"))
        val levels = u.groupBy($"tv").agg(max($"ne").as("gmax"))
        val stair = Pipeline.globalPrefixMax(
          levels, Seq($"tv".desc), $"gmax")
        val keepLevels = stair
          .filter($"pre_max".isNull || $"gmax" > $"pre_max")
          .select($"tv".as("k_tv"), $"gmax")
        u.join(keepLevels, $"tv" === $"k_tv" && $"ne" === $"gmax", "left_semi")
          .select($"user_id", $"tv".as("total_cents"),
            $"ne".cast("long").as("n_events"))
          .orderBy($"user_id")
      }))
}

package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Log-log price elasticity of demand per brand — the econometric
  * workhorse ε = d ln(quantity)/d ln(unit price), estimated by OLS of
  * ln q on ln p over a brand's line items. ε < −1 is elastic (price
  * cuts grow revenue), −1 < ε < 0 inelastic; the coefficient pricing
  * teams actually read. Unit price is extendedprice/quantity, the
  * classic TPC-H derivation.
  *
  * Determinism: each row's (ln p, ln q) and their products are
  * snapped to the 1e-9 grid and summed in DECIMAL(28,12); the OLS
  * closed form is one fixed-order double expression from those exact
  * sums, snapped.
  *
  * Scale: one projection + ONE hash aggregate per brand with map-side
  * combine — five mergeable decimal counters per key.
  */
object Elasticity {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_price_elasticity",
      Some(s"""
        WITH o AS (
          SELECT p.p_brand AS brand,
                 CAST(${det.sqlSnap9("ln(l.l_extendedprice / l.l_quantity)")}
                   AS DECIMAL(28,12)) AS lx,
                 CAST(${det.sqlSnap9("ln(l.l_quantity)")}
                   AS DECIMAL(28,12)) AS ly,
                 CAST(${det.sqlSnap9(
          "ln(l.l_extendedprice / l.l_quantity) * ln(l.l_quantity)")}
                   AS DECIMAL(28,12)) AS lxy,
                 CAST(${det.sqlSnap9(
          "ln(l.l_extendedprice / l.l_quantity)" +
            " * ln(l.l_extendedprice / l.l_quantity)")}
                   AS DECIMAL(28,12)) AS lxx
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
        mo AS (
          SELECT brand, COUNT(*) AS n,
                 CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
                 CAST(SUM(lxy) AS DOUBLE) AS sxy,
                 CAST(SUM(lxx) AS DOUBLE) AS sxx
          FROM o GROUP BY brand)
        SELECT brand, CAST(n AS BIGINT) AS n_lines,
               ${det.sqlSnap9(
          "(sxy - sx * sy / n) / (sxx - sx * sx / n)")} AS elasticity,
               ${det.sqlSnap9(
          "(sxy - sx * sy / n) / (sxx - sx * sx / n)")} < -1.0 AS elastic
        FROM mo
        ORDER BY brand
      """.trim),
      (s, d) => {
        import s.implicits._
        val lx = log($"l_extendedprice" / $"l_quantity")
        val ly = log($"l_quantity")
        // The 4 ln()+snap9+DECIMAL casts per row are the query's cost;
        // the sf-sized parquet scan yields fewer splits than cores, so
        // that projection ran on the scan's task count. Repartitioning
        // the three needed columns to the session's parallelism before
        // the heavy projection costs one narrow ~15 MB shuffle and
        // spreads the expression work across every core (guide §2.5
        // input-parallelism). Conditional (r12 ADVICE): when the scan
        // already yields at least session-parallelism splits — the
        // cluster-scale regime — the repartition would COALESCE the
        // scan and add a shuffle for nothing, so it is skipped; the
        // split estimate is stat-bytes / maxPartitionBytes, free at
        // plan time.
        val liProj = lineitem(s, d)
          .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        val nPar = s.sessionState.conf.numShufflePartitions
        val estSplits = liProj.queryExecution.optimizedPlan.stats.sizeInBytes /
          s.sessionState.conf.filesMaxPartitionBytes
        val liSpread =
          if (estSplits < nPar) liProj.repartition(nPar) else liProj
        val o = liSpread
          .join(broadcast(part(s, d)), $"p_partkey" === $"l_partkey")
          .filter($"l_quantity" > 0 && $"l_extendedprice" > 0)
          .select($"p_brand".as("brand"),
            det.snap9(lx).cast(DecimalType(28, 12)).as("lx"),
            det.snap9(ly).cast(DecimalType(28, 12)).as("ly"),
            det.snap9(lx * ly).cast(DecimalType(28, 12)).as("lxy"),
            det.snap9(lx * lx).cast(DecimalType(28, 12)).as("lxx"))
        val mo = o.groupBy($"brand")
          .agg(count(lit(1)).as("n"),
            sum($"lx").cast("double").as("sx"),
            sum($"ly").cast("double").as("sy"),
            sum($"lxy").cast("double").as("sxy"),
            sum($"lxx").cast("double").as("sxx"))
        val el = det.snap9(($"sxy" - $"sx" * $"sy" / $"n")
          / ($"sxx" - $"sx" * $"sx" / $"n"))
        mo.select($"brand", $"n".cast("long").as("n_lines"),
            el.as("elasticity"), (el < lit(-1.0)).as("elastic"))
          .orderBy($"brand")
      }))
}

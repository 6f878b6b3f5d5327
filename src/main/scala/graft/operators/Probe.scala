package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed training loop: a linear probe (squared loss, full-batch
  * gradient descent, 2 steps, lr 0.5, w₀ = 0) fit to predict the
  * heuristic quality gate from the quality model's own scaled
  * features — the "train a cheap classifier on heuristic labels" move
  * every corpus-curation stack makes (fastText-style filters), here
  * with the TRAINING itself distributed and oracle-mirrored iteration
  * by iteration, the [[Similarity.kmeansCentroids]] contract.
  *
  * Determinism: each per-feature gradient term err·xⱼ snaps to a 1e-9
  * grid and sums in DECIMAL(38,0) — exact, order-independent,
  * overflow-safe at any corpus size (the sim_pca_power discipline) —
  * and the weight updates are fixed-order double arithmetic identical
  * in both engines. The whole model state is 6 doubles per step; in
  * this formulation it never even leaves the plan (1-row gradient
  * frames broadcast into the next pass), which is exactly how the
  * update ships on a cluster.
  *
  * Squared loss rather than logistic: the gradient is free of
  * transcendental functions (exp/log differ in the last ulp across
  * libm implementations), so cross-engine bit-equality holds without
  * any tolerance. MSE of the final weights closes the readout.
  */
object Probe {

  private val LR = 0.5
  private val FEATS = Seq("x0", "x1", "x2", "x3", "x4", "x5")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "pl_linear_probe", {
        def snapSum(expr: String) =
          s"CAST(SUM(CAST(floor(($expr) * CAST(1000000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE) / CAST(1000000000.0 AS DOUBLE)"
        def pred(w: String) =
          FEATS.map(f => s"$w.w_$f * $f").mkString(" + ")
        def gradRow(errExpr: String, from: String) =
          FEATS.map(f => s"${snapSum(s"($errExpr) * $f")} / n AS g_$f")
            .mkString(",\n                   ")
        def stepRow(w: String, g: String) =
          FEATS.map(f => s"$w.w_$f - CAST($LR AS DOUBLE) * $g.g_$f AS w_$f")
            .mkString(",\n                   ")
        Some(s"""
          WITH ${Pipeline.qmFeatsSql},
          x AS (
            SELECT CAST(1.0 AS DOUBLE) AS x0,
                   least(n_tokens, 100) / CAST(100.0 AS DOUBLE) AS x1,
                   stop_ratio AS x2,
                   mean_tok / CAST(10.0 AS DOUBLE) AS x3,
                   distinct_ratio AS x4,
                   digit_frac AS x5,
                   CAST(${Pipeline.qmLabelSql} AS DOUBLE) AS y
            FROM feats),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
          w0 AS (SELECT ${FEATS.map(f => s"CAST(0.0 AS DOUBLE) AS w_$f").mkString(", ")}),
          g1 AS (
            SELECT ${gradRow("(" + pred("w0") + ") - y", "x")}
            FROM x CROSS JOIN w0 CROSS JOIN nn GROUP BY n),
          w1 AS (SELECT ${stepRow("w0", "g1")} FROM w0 CROSS JOIN g1),
          g2 AS (
            SELECT ${gradRow("(" + pred("w1") + ") - y", "x")}
            FROM x CROSS JOIN w1 CROSS JOIN nn GROUP BY n),
          w2 AS (SELECT ${stepRow("w1", "g2")} FROM w1 CROSS JOIN g2)
          SELECT ${FEATS.map(f => s"w2.w_$f").mkString(", ")},
                 ${"CAST(SUM(CAST(floor(((" + pred("w2") + ") - y) * ((" + pred("w2") + ") - y) * CAST(1000000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE) / CAST(1000000000.0 AS DOUBLE)"} / n AS mse,
                 n AS n_docs
          FROM x CROSS JOIN w2 CROSS JOIN nn
          GROUP BY ${FEATS.map(f => s"w2.w_$f").mkString(", ")}, n
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val x = Pipeline.modelFeatureRows(s, d).localCheckpoint()
        val nn = x.agg(count(lit(1)).as("n"))
        def snapSum(e: Column): Column =
          (sum(floor(e * lit(1.0e9) + lit(0.5)).cast(DecimalType(38, 0)))
            .cast("double") / lit(1.0e9))
        def predC(w: String): Column =
          FEATS.map(f => col(s"${w}_$f") * col(f)).reduce(_ + _)
        val w0 = FEATS.map(f => lit(0.0).as(s"w0_$f"))
        val g1 = x.crossJoin(broadcast(nn))
          .select((FEATS.map(col) :+ $"y" :+ $"n") ++ w0: _*)
          .groupBy($"n")
          .agg(snapSum((predC("w0") - $"y") * col(FEATS.head)).as(s"s_${FEATS.head}"),
            FEATS.tail.map(f =>
              snapSum((predC("w0") - $"y") * col(f)).as(s"s_$f")): _*)
          .select(FEATS.map(f => (col(s"s_$f") / $"n").as(s"g_$f")): _*)
        val w1 = g1.select(FEATS.map(f =>
          (lit(0.0) - lit(LR) * col(s"g_$f")).as(s"w1_$f")): _*)
        val g2 = x.crossJoin(broadcast(nn)).crossJoin(broadcast(w1))
          .groupBy($"n")
          .agg(snapSum((predC("w1") - $"y") * col(FEATS.head)).as(s"s_${FEATS.head}"),
            FEATS.tail.map(f =>
              snapSum((predC("w1") - $"y") * col(f)).as(s"s_$f")): _*)
          .select(FEATS.map(f => (col(s"s_$f") / $"n").as(s"g_$f")): _*)
        val w2 = w1.crossJoin(g2).select(FEATS.map(f =>
          (col(s"w1_$f") - lit(LR) * col(s"g_$f")).as(s"w2_$f")): _*)
        x.crossJoin(broadcast(nn)).crossJoin(broadcast(w2))
          .groupBy(FEATS.map(f => col(s"w2_$f")) :+ $"n": _*)
          .agg(snapSum((predC("w2") - $"y") * (predC("w2") - $"y")).as("sse"))
          .select(FEATS.map(f => col(s"w2_$f").as(s"w_$f")) ++
            Seq(($"sse" / $"n").as("mse"), $"n".as("n_docs")): _*)
      }))
}

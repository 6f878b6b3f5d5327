package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** EM estimation of Fellegi–Sunter parameters (Winkler 1988; the
  * Jaro/Winkler Census approach): instead of er_fellegi_sunter's
  * clerical m-probabilities, learn (p, m_f, u_f) from the agreement
  * PATTERNS of the candidate pairs — E-step: posterior match weight
  * per pattern under conditional independence; M-step: re-estimate
  * parameters from weighted pattern counts; two fixed iterations from
  * the canonical (p=.5, m=.9, u=.1) start. The output is the learned
  * parameter row — what production linkers actually run, since
  * clerical m's are guesses.
  *
  * Determinism: the 8 pattern counts are exact integers; every E/M
  * expression is fixed-order double arithmetic over snapped DECIMAL
  * folds of ≤8 terms, so both iterations are bit-reproducible.
  *
  * Scale: agreement patterns are ONE aggregate over the (linear,
  * FastSS-generated) candidate pairs — the EM itself runs on 8 rows
  * regardless of corpus size.
  */
object EmWeights {

  private val iters = 2

  // one EM round: from params row (p, mn, ms, mb, un, us, ub) and the
  // 8-row pattern table (gn, gs, gb, n) to the next params row
  private def sqlIter(i: Int): String = {
    val prev = s"p${i - 1}"
    s"""w$i AS MATERIALIZED (
      SELECT g.gn, g.gs, g.gb, g.n,
             ${det.sqlSnap9(
        "(p.p * (CASE WHEN g.gn = 1 THEN p.mn ELSE 1 - p.mn END)" +
          "     * (CASE WHEN g.gs = 1 THEN p.ms ELSE 1 - p.ms END)" +
          "     * (CASE WHEN g.gb = 1 THEN p.mb ELSE 1 - p.mb END))" +
          " / (p.p * (CASE WHEN g.gn = 1 THEN p.mn ELSE 1 - p.mn END)" +
          "       * (CASE WHEN g.gs = 1 THEN p.ms ELSE 1 - p.ms END)" +
          "       * (CASE WHEN g.gb = 1 THEN p.mb ELSE 1 - p.mb END)" +
          "  + (1 - p.p) * (CASE WHEN g.gn = 1 THEN p.un ELSE 1 - p.un END)" +
          "       * (CASE WHEN g.gs = 1 THEN p.us ELSE 1 - p.us END)" +
          "       * (CASE WHEN g.gb = 1 THEN p.ub ELSE 1 - p.ub END))")} AS w
      FROM pat g CROSS JOIN $prev p),
    p$i AS MATERIALIZED (
      SELECT
        CAST(SUM(CAST(${det.sqlSnap9("w * n")} AS DECIMAL(28,12))) AS DOUBLE)
          / SUM(n) AS p,
        CAST(SUM(CAST(${det.sqlSnap9("w * n * gn")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("w * n")} AS DECIMAL(28,12))) AS DOUBLE) AS mn,
        CAST(SUM(CAST(${det.sqlSnap9("w * n * gs")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("w * n")} AS DECIMAL(28,12))) AS DOUBLE) AS ms,
        CAST(SUM(CAST(${det.sqlSnap9("w * n * gb")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("w * n")} AS DECIMAL(28,12))) AS DOUBLE) AS mb,
        CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n * gn")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n")} AS DECIMAL(28,12))) AS DOUBLE) AS un,
        CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n * gs")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n")} AS DECIMAL(28,12))) AS DOUBLE) AS us,
        CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n * gb")} AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(SUM(CAST(${det.sqlSnap9("(1 - w) * n")} AS DECIMAL(28,12))) AS DOUBLE) AS ub
      FROM w$i)"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "er_em_weights",
      Some(s"""
        WITH ${EntityRes.sqlPairs},
        pat AS MATERIALIZED (
          SELECT CASE WHEN x.c_nationkey = y.c_nationkey THEN 1 ELSE 0 END AS gn,
                 CASE WHEN x.c_mktsegment = y.c_mktsegment THEN 1 ELSE 0 END AS gs,
                 CASE WHEN abs(x.c_acctbal - y.c_acctbal) < 100.0 THEN 1 ELSE 0 END AS gb,
                 COUNT(*) AS n
          FROM pairs p
          JOIN customer x ON p.a = x.c_custkey
          JOIN customer y ON p.b = y.c_custkey
          GROUP BY 1, 2, 3),
        p0 AS (SELECT CAST(0.5 AS DOUBLE) AS p,
                      CAST(0.9 AS DOUBLE) AS mn, CAST(0.9 AS DOUBLE) AS ms,
                      CAST(0.9 AS DOUBLE) AS mb,
                      CAST(0.1 AS DOUBLE) AS un, CAST(0.1 AS DOUBLE) AS us,
                      CAST(0.1 AS DOUBLE) AS ub),
        ${(1 to iters).map(sqlIter).mkString(",\n")}
        SELECT ${det.sqlSnap9("p")} AS p_match,
               ${det.sqlSnap9("mn")} AS m_nation, ${det.sqlSnap9("un")} AS u_nation,
               ${det.sqlSnap9("ms")} AS m_segment, ${det.sqlSnap9("us")} AS u_segment,
               ${det.sqlSnap9("mb")} AS m_balance, ${det.sqlSnap9("ub")} AS u_balance
        FROM p$iters
      """.trim),
      (s, d) => {
        import s.implicits._
        val cust = customer(s, d)
        val attrs = cust.select($"c_custkey", $"c_nationkey",
          $"c_mktsegment", $"c_acctbal")
        val pat = EntityRes.edit1Pairs(cust)
          .join(attrs.select($"c_custkey".as("a"), $"c_nationkey".as("na"),
            $"c_mktsegment".as("sa"), $"c_acctbal".as("ba")), "a")
          .join(attrs.select($"c_custkey".as("b"), $"c_nationkey".as("nb"),
            $"c_mktsegment".as("sb"), $"c_acctbal".as("bb")), "b")
          .groupBy(
            when($"na" === $"nb", 1).otherwise(0).as("gn"),
            when($"sa" === $"sb", 1).otherwise(0).as("gs"),
            when(abs($"ba" - $"bb") < 100.0, 1).otherwise(0).as("gb"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        def mProd(p: DataFrame) = // joins are 8×1 rows; plain crossJoin
          pat.crossJoin(p)
        var params: DataFrame = Seq((0.5, 0.9, 0.9, 0.9, 0.1, 0.1, 0.1))
          .toDF("p", "mn", "ms", "mb", "un", "us", "ub")
        def side(m: String, g: org.apache.spark.sql.Column) =
          when(g === 1, col(m)).otherwise(lit(1) - col(m))
        for (_ <- 1 to iters) {
          val w = mProd(params).select($"gn", $"gs", $"gb", $"n",
            det.snap9(($"p" * side("mn", $"gn") * side("ms", $"gs")
              * side("mb", $"gb"))
              / ($"p" * side("mn", $"gn") * side("ms", $"gs")
                * side("mb", $"gb")
                + (lit(1) - $"p") * side("un", $"gn") * side("us", $"gs")
                * side("ub", $"gb"))).as("w"))
          def dsumOf(c: org.apache.spark.sql.Column) =
            sum(det.snap9(c).cast(DecimalType(28, 12))).cast("double")
          params = w.agg(
            (dsumOf($"w" * $"n") / sum($"n")).as("p"),
            (dsumOf($"w" * $"n" * $"gn") / dsumOf($"w" * $"n")).as("mn"),
            (dsumOf($"w" * $"n" * $"gs") / dsumOf($"w" * $"n")).as("ms"),
            (dsumOf($"w" * $"n" * $"gb") / dsumOf($"w" * $"n")).as("mb"),
            (dsumOf((lit(1) - $"w") * $"n" * $"gn")
              / dsumOf((lit(1) - $"w") * $"n")).as("un"),
            (dsumOf((lit(1) - $"w") * $"n" * $"gs")
              / dsumOf((lit(1) - $"w") * $"n")).as("us"),
            (dsumOf((lit(1) - $"w") * $"n" * $"gb")
              / dsumOf((lit(1) - $"w") * $"n")).as("ub"))
            .localCheckpoint()
        }
        params.select(det.snap9($"p").as("p_match"),
          det.snap9($"mn").as("m_nation"), det.snap9($"un").as("u_nation"),
          det.snap9($"ms").as("m_segment"), det.snap9($"us").as("u_segment"),
          det.snap9($"mb").as("m_balance"), det.snap9($"ub").as("u_balance"))
      }))
}

package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Krippendorff's alpha (nominal, complete data) over a synthetic
  * 3-rater annotation pass — the inter-annotator reliability number an
  * annotation pipeline must clear before its labels train anything
  * (Krippendorff, "Content Analysis" §11; generalizes
  * `pl_rater_kappa`'s pairwise kappa to the coincidence-matrix form
  * that handles any number of raters and, in general, missing
  * ratings). Ratings are hash-derived: a per-doc base label in 4
  * categories, each rater flipping to an independent label on a
  * deterministic 20%-rate coin — so the fixture has real but imperfect
  * agreement and the expected alpha is materially inside (0, 1).
  *
  * With complete data the whole statistic is exact integer algebra:
  *   D_o/D_e = U·(n−1) / (n² − Σ_c n_c²)
  * where U = Σ_units (ordered disagreeing pairs)/(m−1) — an integer
  * when m = 3 — n = total ratings and n_c the category marginals;
  * alpha = 1 − D_o/D_e is the only double, snapped.
  *
  * Scale: ratings are a 3× projection of documents; disagreements are
  * a per-unit self-join on a 3-row group; marginals one groupBy.
  */
object Krippendorff {

  private def lbl(rSql: String): String = {
    val base = PortableHash.sqlH32("doc_id || ':kbase'")
    val noise = PortableHash.sqlH32(s"doc_id || ':kr:' || $rSql")
    val flip = PortableHash.sqlH32(s"doc_id || ':kflip:' || $rSql")
    s"CASE WHEN $flip % 5 = 0 THEN $noise % 4 ELSE $base % 4 END"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_krippendorff_alpha",
      Some(s"""
        WITH raters AS (SELECT UNNEST(range(0, 3)) AS r),
        ratings AS (
          SELECT d.doc_id, raters.r, CAST(${lbl("raters.r")} AS BIGINT) AS c
          FROM documents d CROSS JOIN raters),
        dis AS (
          -- ordered disagreeing pairs / (m-1), m = 3: U stays integer
          SELECT CAST(SUM(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) AS BIGINT) AS u
          FROM ratings a JOIN ratings b
            ON a.doc_id = b.doc_id AND a.r <> b.r),
        marg AS (
          SELECT c, COUNT(*) AS nc FROM ratings GROUP BY c),
        tot AS (
          SELECT CAST(SUM(nc) AS BIGINT) AS n,
                 CAST(SUM(nc * nc) AS BIGINT) AS snc2,
                 CAST(COUNT(*) AS BIGINT) AS n_cat
          FROM marg),
        units AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units FROM documents)
        SELECT u.n_units,
               t.n AS n_ratings,
               t.n_cat AS n_categories,
               CAST(d.u / 2 AS BIGINT) AS disagreement_mass,
               ${det.sqlSnap9(
        "1.0 - (d.u / 2.0) * (t.n - 1) / (t.n * t.n - t.snc2)")} AS alpha
        FROM dis d, tot t, units u
      """.trim),
      (s, d) => {
        import s.implicits._
        def lblCol(r: org.apache.spark.sql.Column) = {
          val base = PortableHash.h32(concat($"doc_id".cast("string"), lit(":kbase")))
          val noise = PortableHash.h32(concat($"doc_id".cast("string"), lit(":kr:"), r.cast("string")))
          val flip = PortableHash.h32(concat($"doc_id".cast("string"), lit(":kflip:"), r.cast("string")))
          when(flip % 5 === 0, noise % 4).otherwise(base % 4).cast("long")
        }
        val raters = Seq(0, 1, 2).toDF("r")
        val ratings = documents(s, d).select($"doc_id")
          .crossJoin(broadcast(raters))
          .select($"doc_id", $"r", lblCol($"r").as("c"))
          .localCheckpoint() // disagreement join + marginals
        val dis = ratings.as("a").join(ratings.as("b"),
            $"a.doc_id" === $"b.doc_id" && $"a.r" =!= $"b.r")
          .agg(sum(when($"a.c" =!= $"b.c", 1L).otherwise(0L))
            .cast("long").as("u"))
        val tot = ratings.groupBy($"c").agg(count(lit(1)).as("nc"))
          .agg(sum($"nc").cast("long").as("n"),
            sum($"nc" * $"nc").cast("long").as("snc2"),
            count(lit(1)).cast("long").as("n_cat"))
        val units = documents(s, d).agg(count(lit(1)).cast("long").as("n_units"))
        dis.crossJoin(broadcast(tot)).crossJoin(broadcast(units))
          .select($"n_units", $"n".as("n_ratings"),
            $"n_cat".as("n_categories"),
            ($"u" / 2).cast("long").as("disagreement_mass"),
            det.snap9(lit(1.0) - ($"u" / 2.0) * ($"n" - 1)
              / ($"n" * $"n" - $"snc2")).as("alpha"))
      }))
}

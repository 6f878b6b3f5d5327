package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Bloom-filter calibration audit: build a k=4-hash, m=4096-bit
  * filter over the EVEN user ids, probe it with the ODD ids (true
  * negatives by construction), and report the MEASURED false-positive
  * rate next to the theoretical (1 − e^(−kn/m))^k — the check that
  * validates a bloom-join's pruning claims before trusting it in a
  * plan. A measured FPR far above theory means correlated hash
  * positions (a bad hash family), the classic silent bloom failure.
  *
  * Determinism: bit positions come from the portable MD5-based
  * universal hashes; membership is an exact set-semijoin on (probe
  * position ⊆ set bits); theory is one fixed-order double from exact
  * integer counts, snapped.
  *
  * Scale: the filter is the distinct (depth, pos) relation (≤ k·m
  * rows, data-independent bound) built by one aggregate; probing is a
  * left-anti/semi join per depth folded to a per-probe ALL-bits-hit
  * flag — hash joins end to end, no driver bit array.
  */
object BloomFpr {

  private val k = 4
  private val m = 4096

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk_bloom_fpr", {
        val h = PortableHash.sqlH32("CAST(user_id AS VARCHAR)")
        def pos(i: Int) = s"(${PortableHash.sqlUhash(h, i)} % $m)"
        Some(s"""
        WITH evens AS (
          SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0),
        odds AS (
          SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 1),
        bits AS (
          ${(0 until k).map(i =>
          s"SELECT $i AS depth, ${pos(i)} AS p FROM evens").mkString(" UNION ALL ")}),
        setbits AS (SELECT DISTINCT depth, p FROM bits),
        probes AS (
          ${(0 until k).map(i =>
          s"SELECT user_id, $i AS depth, ${pos(i)} AS p FROM odds")
          .mkString(" UNION ALL ")}),
        hits AS (
          SELECT pr.user_id, COUNT(*) AS n_hit
          FROM probes pr JOIN setbits sb
            ON sb.depth = pr.depth AND sb.p = pr.p
          GROUP BY pr.user_id),
        counts AS (
          SELECT (SELECT COUNT(*) FROM evens) AS n_in,
                 (SELECT COUNT(*) FROM odds) AS n_probe,
                 (SELECT COUNT(*) FROM setbits) AS bits_set,
                 (SELECT COUNT(*) FROM hits WHERE n_hit = $k) AS n_fp)
        SELECT CAST(n_in AS BIGINT) AS n_inserted,
               CAST(n_probe AS BIGINT) AS n_probes,
               CAST(bits_set AS BIGINT) AS bits_set,
               CAST(n_fp AS BIGINT) AS false_positives,
               ${det.sqlSnap9("n_fp * 1.0 / n_probe")} AS fpr_measured,
               ${det.sqlSnap9(
          s"pow(1.0 - exp(-($k.0 * n_in) / $m), $k.0)")} AS fpr_theory
        FROM counts
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val users = events(s, d).select($"user_id").distinct()
        val evens = users.filter($"user_id" % 2 === 0)
        val odds = users.filter($"user_id" % 2 === 1)
        def positions(df: org.apache.spark.sql.DataFrame) = {
          val h = PortableHash.h32($"user_id".cast("string"))
          (0 until k).map(i => df.select($"user_id", lit(i).as("depth"),
            (PortableHash.uhash(h, i) % m).as("p"))).reduce(_ unionByName _)
        }
        val setbits = positions(evens).select($"depth", $"p").distinct()
        val probes = positions(odds)
        val hits = probes.join(setbits
            .select($"depth".as("s_d"), $"p".as("s_p")),
            $"depth" === $"s_d" && $"p" === $"s_p")
          .groupBy($"user_id").agg(count(lit(1)).as("n_hit"))
        val nFp = hits.filter($"n_hit" === k).agg(count(lit(1)).as("n_fp"))
        val nIn = evens.agg(count(lit(1)).as("n_in"))
        val nPr = odds.agg(count(lit(1)).as("n_probe"))
        val nBits = setbits.agg(count(lit(1)).as("bits_set"))
        nIn.crossJoin(nPr).crossJoin(nBits).crossJoin(nFp)
          .select($"n_in".cast("long").as("n_inserted"),
            $"n_probe".cast("long").as("n_probes"),
            $"bits_set".cast("long").as("bits_set"),
            $"n_fp".cast("long").as("false_positives"),
            det.snap9($"n_fp" * lit(1.0) / $"n_probe").as("fpr_measured"),
            det.snap9(pow(lit(1.0) - exp(-(lit(k.toDouble) * $"n_in") / m),
              k.toDouble)).as("fpr_theory"))
      }))
}

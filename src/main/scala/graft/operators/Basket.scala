package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Market-basket association mining over the order fact table — the
  * co-purchase readout behind "customers who bought X also bought Y".
  *
  * q51_copurchase_lift: distinct (order, part) item sets → within-order
  * part pairs (a < b orientation so each unordered pair appears once)
  * → pair support → lift against the independence expectation
  * n_ab·N / (n_a·n_b). The pair self-join is keyed on the order id,
  * whose group size is the order's item count (≤ a few dozen by
  * construction of a purchase order) — so unlike a wedge join on a
  * power-law node this self-join is bounded per key and scales
  * linearly in orders at 100 TB; the part-frequency sides are
  * dimension-sized (|parts|) and broadcast. Lift and confidence are
  * ratios of exact integer counts — deterministic doubles — and the
  * result is a top-50 under (lift desc, p1, p2), which Spark executes
  * as TakeOrderedAndProject (no global sort materialization).
  */
object Basket {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q51_copurchase_lift",
      Some("""
        WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        nn AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
        freq AS (SELECT pk, COUNT(*) AS nf FROM items GROUP BY pk),
        pairs AS (
          SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS nab
          FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
               CAST(nab AS BIGINT) AS support,
               CAST(f1.nf AS BIGINT) AS n_p1, CAST(f2.nf AS BIGINT) AS n_p2,
               nab * 1.0 / f1.nf AS confidence,
               (nab * n_orders) * 1.0 / (f1.nf * f2.nf) AS lift
        FROM pairs JOIN freq f1 ON f1.pk = p1 JOIN freq f2 ON f2.pk = p2
        CROSS JOIN nn
        ORDER BY lift DESC, p1, p2 LIMIT 50
      """.trim),
      (s, d) => {
        import s.implicits._
        val items = lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
        val nn = items.agg(count_distinct($"ok").as("n_orders"))
        val freq = items.groupBy($"pk").agg(count(lit(1)).as("nf"))
        val pairs = items.as("a")
          .join(items.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
          .groupBy($"a.pk".as("p1"), $"b.pk".as("p2"))
          .agg(count(lit(1)).as("nab"))
          .filter($"nab" >= 2)
        pairs
          .join(broadcast(freq.select($"pk".as("p1"), $"nf".as("nf1"))), "p1")
          .join(broadcast(freq.select($"pk".as("p2"), $"nf".as("nf2"))), "p2")
          .crossJoin(broadcast(nn))
          .select($"p1".cast("long").as("p1"), $"p2".cast("long").as("p2"),
            $"nab".cast("long").as("support"),
            $"nf1".cast("long").as("n_p1"), $"nf2".cast("long").as("n_p2"),
            ($"nab" * lit(1.0) / $"nf1").as("confidence"),
            (($"nab" * $"n_orders") * lit(1.0) / ($"nf1" * $"nf2")).as("lift"))
          .orderBy($"lift".desc, $"p1", $"p2")
          .limit(50)
      }))
}

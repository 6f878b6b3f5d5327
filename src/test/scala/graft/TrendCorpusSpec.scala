package graft

import graft.operators.{CorpusStats, Curriculum, Graph, Relational3, Trend}
import org.apache.spark.sql.functions._

/** Structural invariants of the round-5 trend / corpus-stat /
  * curriculum / report operators (exact values are pinned by the
  * DuckDB oracle; these pin what must hold on ANY input). */
class TrendCorpusSpec extends SparkSpec {

  private def q(defs: Seq[QueryDef], name: String) =
    defs.find(_.name == name).get.fn(spark, sf)

  test("holt linear: forecast is level+trend and first level equals first y") {
    import spark.implicits._
    val h = q(Trend.defs, "ts_holt_linear").cache()
    assert(h.filter($"forecast_1d" =!= $"level" + $"trend").count() == 0)
    // first row per user: level = y exactly (the init condition)
    val firsts = h.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"day")))
      .filter($"rn" === 1)
    assert(firsts.filter($"level" =!= $"y").count() == 0)
    // every user emitted has >= 2 days (trend needs two points)
    val perUser = h.groupBy($"user_id").count()
    assert(perUser.filter($"count" < 2).count() == 0)
  }

  test("theil-sen: one slope per multi-day user, taken from the actual pair set") {
    import spark.implicits._
    val t = q(Trend.defs, "ts_theil_sen").cache()
    assert(t.groupBy($"user_id").count().filter($"count" > 1).count() == 0)
    // n_pairs = days*(days-1)/2 for that user's active-day count
    val days = sources.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(countDistinct(date_format($"ts", "yyyy-MM-dd")).as("nd"))
    val joined = t.join(days, "user_id")
    assert(joined.filter($"n_pairs" =!= $"nd" * ($"nd" - 1) / 2).count() == 0)
  }

  test("token entropy: 0 <= H <= log2(n_tokens) and ttr in (0, 1]") {
    import spark.implicits._
    val e = q(CorpusStats.defs, "ta_token_entropy").cache()
    // tolerance is the 1e-6 output grid: snapping can round H up to
    // half a grid step past the exact log2(n) bound
    assert(e.filter($"entropy" < -1e-6).count() == 0)
    assert(e.filter($"entropy" > log2($"n_tokens") + 1e-6).count() == 0)
    assert(e.filter($"ttr" <= 0 || $"ttr" > 1).count() == 0)
    assert(e.filter($"n_types" > $"n_tokens").count() == 0)
  }

  test("zipf fit: slope is negative on any natural-ish corpus ranking") {
    val r = q(CorpusStats.defs, "ta_zipf_slope").collect().head
    // top-100 cap, but a tiny corpus can have a smaller vocabulary
    val n = r.getAs[Long]("n_terms")
    assert(n > 1 && n <= 100)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("filter funnel: monotone survivors, exact drop accounting") {
    val rows = q(Curriculum.defs, "pl_filter_funnel").collect()
    assert(rows.length == 5)
    val outs = rows.map(_.getAs[Long]("rows_out"))
    assert(outs.sliding(2).forall { case Array(a, b) => b <= a })
    // dropped(i) = rows_out(i-1) - rows_out(i)
    (1 until 5).foreach { i =>
      assert(rows(i).getAs[Long]("dropped") == outs(i - 1) - outs(i))
    }
  }

  test("curriculum: every doc scheduled once, phases contiguous by rank") {
    import spark.implicits._
    val c = q(Curriculum.defs, "pl_curriculum").cache()
    val n = sources.Tables.documents(spark, sf).count()
    assert(c.count() == n)
    assert(c.select($"doc_id").distinct().count() == n)
    // phase is non-decreasing in pos and covers 0..2
    assert(c.select($"phase").distinct().collect().map(_.getLong(0)).sorted
      .sameElements(Array(0L, 1L, 2L)))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"pos")
    assert(c.withColumn("pp", lag($"phase", 1).over(w))
      .filter($"pp" > $"phase").count() == 0)
  }

  test("clustering coefficient: values in [0,1], triangles need degree >= 2") {
    import spark.implicits._
    val cc = q(Graph.defs, "gx_clustering_coeff").cache()
    assert(cc.count() <= 20)
    assert(cc.filter($"local_cc" < 0 || $"local_cc" > 1 + 1e-12).count() == 0)
    assert(cc.filter($"degree" < 2).count() == 0)
  }

  test("market share: share in [0,1]; promo pct in [0,100]") {
    import spark.implicits._
    val ms = q(Relational3.defs, "q40_market_share")
    assert(ms.filter($"mkt_share" < 0 || $"mkt_share" > 1).count() == 0)
    assert(ms.filter($"total_revenue" <= 0).count() == 0)
    val pr = q(Relational3.defs, "q41_promo_revenue")
    assert(pr.filter($"promo_pct" < 0 || $"promo_pct" > 100).count() == 0)
  }
}

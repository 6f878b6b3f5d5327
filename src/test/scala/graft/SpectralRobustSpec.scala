package graft

import graft.operators.{Robust, Spectral}
import org.apache.spark.sql.functions._

/** Structural invariants of the spectral-peak, MAD-anomaly, and
  * code-detection operators. */
class SpectralRobustSpec extends SparkSpec {

  private def q(defs: Seq[QueryDef], name: String) =
    defs.find(_.name == name).get.fn(spark, sf)

  test("spectral peak: power nonnegative, all (type, period) rows present") {
    import spark.implicits._
    val sp = q(Spectral.defs, "ts_spectral_peak").cache()
    assert(sp.filter($"power" < 0).count() == 0)
    val perType = sp.groupBy($"event_type").count()
    assert(perType.filter($"count" =!= 4).count() == 0)
  }

  test("mad anomaly: flagged days exceed 3x the MAD strictly") {
    import spark.implicits._
    val m = q(Robust.defs, "ev_anomaly_mad")
    // dev_ratio may be NULL (mad = 0); all non-null ratios exceed 3
    assert(m.filter($"dev_ratio".isNotNull && $"dev_ratio" <= 3.0).count() == 0)
  }

  test("code detect: flagged count bounded by doc count, ratios in [0,1]") {
    import spark.implicits._
    val c = q(Robust.defs, "ta_code_detect").cache()
    assert(c.count() > 0)
    assert(c.filter($"n_codey" > $"n_docs").count() == 0)
    assert(c.filter($"mean_sym_ratio" < 0 || $"mean_sym_ratio" > 1).count() == 0)
    assert(c.filter($"mean_dig_ratio" < 0 || $"mean_dig_ratio" > 1).count() == 0)
  }

  test("session funnel: stage counts non-increasing") {
    val rows = q(graft.operators.EvBands.defs, "ev_session_funnel").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sessions")).toMap
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
  }

  test("value bands: p50 <= p90 <= max per day") {
    import spark.implicits._
    val b = q(graft.operators.EvBands.defs, "ev_value_bands").cache()
    assert(b.count() > 0)
    assert(b.filter($"p50" > $"p90" || $"p90" > $"max_value").count() == 0)
  }
}

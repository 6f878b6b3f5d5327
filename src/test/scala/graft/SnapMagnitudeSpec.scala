package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the magnitude contract of the det.snap* grid helpers — the
  * class behind the r7 `ts_forecast_reconcile` flapping red row:
  * `round(x·g)/g` is only cross-engine-deterministic while x·g is
  * exactly representable, i.e. |x| ≲ 2^53/g. Every query snapping an
  * operand that can reach millions (cent-scaled sums, large-count
  * products) must use snap6, not snap9; `tools/snapscan.py` sweeps the
  * full Verify surface for outputs that stray into the danger zone.
  */
class SnapMagnitudeSpec extends SparkSpec {

  import spark.implicits._

  test("snap9 is an exact fixpoint on the 1e-9 grid below the 2^53 bound") {
    // values already on the grid must pass through unchanged
    val vals = Seq(0.000000001, 123456.789000001, 8.999e6, -8999999.999999999)
    val out = vals.toDF("x").select(det.snap9(col("x")).as("s")).collect()
    vals.zip(out.map(_.getDouble(0))).foreach { case (v, s) =>
      assert(s === v, s"snap9 moved on-grid value $v to $s")
    }
  }

  test("snap9 diverges beyond 2^53/1e9 — the documented overflow zone") {
    // at x ~ 1e8 (cent-scale daily sums), x*1e9 ~ 1e17 where doubles
    // are spaced 16 apart: consecutive representable snapped values
    // differ by MORE than the grid step, so the 1e-9 grid cannot hold
    // the value — grid spacing at that magnitude exceeds 1e-9.
    val x = 1.23456789e8
    val spacing = math.ulp(x * 1e9) / 1e9
    assert(spacing > 1e-9,
      "expected 1e-9 grid to be unrepresentable at cent-scale 1e8")
  }

  test("snap6 holds the grid exactly through the cent-scale danger zone") {
    // dollar-scale (and even cent-scale ~1e8) values stay exact on the
    // 1e-6 grid: x*1e6 <= ~1e14 < 2^53
    val vals = Seq(1.234567e6, 9.999999e7, 1.23456789e8)
    val out = vals.map(v => math.floor(v * 1e6 + 0.5) / 1e6)
      .toDF("x").select(det.snap6(col("x")).as("s")).collect()
    out.foreach { r =>
      val s = r.getDouble(0)
      assert(s * 1e6 === math.rint(s * 1e6),
        s"snap6 output $s is off the 1e-6 grid")
    }
    assert(math.ulp(1.23456789e8 * 1e6) < 0.5,
      "1e-6 grid must stay exactly decidable at 1e8 magnitudes")
  }

  test("the reconcile query's doubles are exact BIGINT micro-dollars (r9 integer interior)") {
    // ts_forecast_reconcile (driver-red in r7 AND r8 under two
    // different snap grids) now keeps its whole interior in BIGINT
    // micro-dollars and divides by 1e6 only in the final projection.
    // Pin BOTH halves of that contract: every output double times 1e6
    // is an exact integer (so any engine build divides to identical
    // bits), and the magnitudes stay far inside the 2^53/1e6 exactness
    // bound even at 100x this fixture.
    val df = SparkEntry.queries("ts_forecast_reconcile")(spark, sf)
    val doubles = df.schema.fields.filter(_.dataType.typeName == "double").map(_.name)
    val rows = df.select(doubles.map(c => col(c)).toSeq: _*).collect()
    rows.foreach { r =>
      doubles.indices.foreach { i =>
        val v = r.getDouble(i)
        assert(math.rint(v * 1e6) === v * 1e6,
          s"${doubles(i)} value $v is not an exact micro-dollar integer")
        assert(math.abs(v) < 9.0e9,
          s"${doubles(i)} magnitude $v breaches the 1e-6 exactness bound")
      }
    }
  }
}

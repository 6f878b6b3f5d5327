package graft

/** STL decomposition pins: the additive identity holds exactly on
  * interior rows (trend+seasonal+residual == x under the fixed snap9
  * arithmetic), trend is NULL exactly at the ±12h series edges, and the
  * seasonal component is a pure hour-of-day function (24 distinct
  * values per series).
  */
class StlSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("ts_stl_decompose")(spark, sf).collect()

  test("additive identity holds on interior rows") {
    val interior = rows.filter(!_.isNullAt(3))
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val x = r.getLong(2).toDouble
      val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recon - x) < 1e-6,
        s"trend+seasonal+residual=$recon != x=$x at h=${r.getLong(1)}")
    }
  }

  test("trend is NULL exactly at the +-12h edges") {
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      val hs = series.map(_.getLong(1))
      val lo = hs.min + 11
      val hi = hs.max - 11
      series.foreach { r =>
        val edge = r.getLong(1) <= lo || r.getLong(1) >= hi
        assert(r.isNullAt(3) == edge,
          s"trend null-ness wrong at h=${r.getLong(1)} (edge=$edge)")
        assert(r.isNullAt(5) == edge)
      }
    }
  }

  test("seasonal is a pure hour-of-day function") {
    rows.groupBy(_.getString(0)).foreach { case (et, series) =>
      series.groupBy(_.getLong(1) % 24).foreach { case (hod, g) =>
        val vals = g.map(_.getDouble(4)).distinct
        assert(vals.size == 1, s"$et hod=$hod has ${vals.size} seasonal values")
      }
    }
  }
}

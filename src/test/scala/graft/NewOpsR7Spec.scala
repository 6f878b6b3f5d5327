package graft

import org.apache.spark.sql.functions._

/** Pins for the round-7 additions: Benford conformance, encoding
  * artifacts, random-walk corpus, group-sequential testing, and
  * Holt–Winters.
  */
class NewOpsR7Spec extends SparkSpec {

  test("dq_benford: shares sum to 1 per metric, digits are 1-9") {
    val rows = SparkEntry.queries("dq_benford")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(1)
      assert(d >= 1 && d <= 9)
      assert(r.getDouble(6) >= 0) // mad
      assert(r.getDouble(7) >= 0) // chi2_over_n
    }
    rows.groupBy(_.getString(0)).foreach { case (m, g) =>
      val tot = g.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-6, s"$m shares sum to $tot")
      assert(g.map(_.getDouble(6)).distinct.size == 1, "mad is per-metric")
    }
  }

  test("ta_encoding_artifacts: detectors fire on corrupted text") {
    import spark.implicits._
    // unit-fire each detector through the same predicates the query
    // compiles (documents are clean, so the query alone can't prove
    // the detectors work)
    val bad = Seq(
      ("clean text, nothing wrong", 0, 0, 0, 0),
      ("cafÿfd broken � here", 1, 0, 0, 0),
      ("mojibake cafÃ© and â€œquotedâ€", 0, 1, 0, 0),
      ("controlbell", 0, 0, 1, 0),
      ("lossy ??? run", 0, 0, 0, 1)).toDF("text", "e1", "e2", "e3", "e4")
    val f = bad.select(
      when(col("text").contains("�"), 1).otherwise(0).as("f1"),
      when(col("text").contains("Ã") || col("text").contains("â€"), 1)
        .otherwise(0).as("f2"),
      when(col("text").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), 1)
        .otherwise(0).as("f3"),
      when(col("text").rlike("\\?{3,}"), 1).otherwise(0).as("f4"),
      col("e1"), col("e2"), col("e3"), col("e4")).collect()
    f.foreach { r =>
      assert(r.getInt(0) == r.getInt(4), s"fffd detector: $r")
      assert(r.getInt(1) == r.getInt(5), s"mojibake detector: $r")
      assert(r.getInt(2) == r.getInt(6), s"control detector: $r")
      assert(r.getInt(3) == r.getInt(7), s"qrun detector: $r")
    }
    // and the aggregate query itself accounts for every document
    val agg = SparkEntry.queries("ta_encoding_artifacts")(spark, sf).collect()
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(agg.map(_.getLong(1)).sum == nDocs)
    agg.foreach(r => assert(r.getLong(6) <= r.getLong(1)))
  }

  test("gx_random_walks: every step follows a real edge, walks are full-length") {
    val rows = SparkEntry.queries("gx_random_walks")(spark, sf).collect()
    val e0 = sources.Tables.orders(spark, sf)
      .join(sources.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct().collect()
    val edges = e0.flatMap(r => Seq((r.getLong(0), r.getLong(1)),
      (r.getLong(1), r.getLong(0)))).toSet
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case ((start, _), steps) =>
        assert(steps.length == 5, s"walk from $start has ${steps.length} steps")
        val path = steps.sortBy(_.getLong(2)).map(_.getLong(3))
        assert(path.head == start)
        path.sliding(2).foreach { case Array(a, b) =>
          assert(edges.contains((a, b)), s"non-edge $a -> $b in walk")
        }
    }
    // the two walks per node must diverge somewhere on the corpus
    val diverged = rows.groupBy(_.getLong(0)).exists { case (_, g) =>
      val byWalk = g.groupBy(_.getLong(1)).view
        .mapValues(_.sortBy(_.getLong(2)).map(_.getLong(3)).toSeq)
      byWalk.values.toSeq.distinct.size > 1
    }
    assert(diverged, "walk ids never diverged — hash seed not applied")
  }

  test("ev_sequential_test: counts are cumulative, boundary relaxes") {
    val rows = SparkEntry.queries("ev_sequential_test")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) >= a.getLong(2) && b.getLong(3) >= a.getLong(3))
      assert(b.getLong(4) >= a.getLong(4) && b.getLong(5) >= a.getLong(5))
      assert(b.getDouble(7) < a.getDouble(7), "OBF boundary must decrease")
    }
    rows.foreach { r =>
      if (!r.isNullAt(6) && !r.isNullAt(8))
        assert(r.getBoolean(8) == (math.abs(r.getDouble(6)) > r.getDouble(7)))
    }
  }

  test("ts_holt_winters: fitted + residual == x, full series emitted") {
    val rows = SparkEntry.queries("ts_holt_winters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) + r.getDouble(7) - r.getLong(2)) < 1e-6)
    }
    rows.groupBy(_.getString(0)).foreach { case (et, g) =>
      assert(g.length == 720 - 24, s"$et emitted ${g.length} rows")
      val hs = g.map(_.getLong(1)).sorted
      assert(hs.head == 24 && hs.last == 719)
    }
  }
}

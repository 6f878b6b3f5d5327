package graft

/** Pins for the round-8 additions: PNG decode features, b-bit minhash
  * estimation, length-grouped batching, and the cluster design effect.
  */
class NewOpsR8Spec extends SparkSpec {

  test("mm_png_decode: dimensions follow the synth formula, features positive") {
    val rows = SparkEntry.queries("mm_png_decode")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8 + id % 9, "width")
      assert(r.getLong(2) === 5 + id % 5, "height")
      val npx = r.getLong(1) * r.getLong(2)
      Seq(3, 4, 5).foreach(i => assert(r.getLong(i) <= npx * 255))
      assert(r.getLong(6) > 0, "wsum")
    }
  }

  test("dd_bbit_minhash: n_match in [0,16]; identical docs estimate 1.0") {
    val rows = SparkEntry.queries("dd_bbit_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getLong(2)
      assert(m >= 0 && m <= 16)
      val est = r.getDouble(4)
      // estimator range for k=16, b=2: [(0-4)/12, 1]
      assert(est >= -1.0 / 3 - 1e-9 && est <= 1.0 + 1e-9)
      assert(r.getDouble(5) >= 0, "abs_err")
      // exact duplicates (jac = 1) must agree on every b-bit slot
      if (r.getDouble(3) === 1.0) assert(m === 16 && est === 1.0)
    }
  }

  test("pl_length_batching: length-sorted batching never pads more than arrival") {
    val rows = SparkEntry.queries("pl_length_batching")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("arrival", "length_sorted"))
    val byPol = rows.map(r => r.getString(0) -> r).toMap
    // both policies batch the same corpus
    assert(byPol("arrival").getLong(2) === byPol("length_sorted").getLong(2))
    assert(byPol("arrival").getLong(1) === byPol("length_sorted").getLong(1))
    // sorting by length is the padding-minimizing contiguous grouping:
    // it can never pad MORE than arrival order
    assert(byPol("length_sorted").getLong(3) <= byPol("arrival").getLong(3))
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "padded >= real")
      val waste = r.getDouble(4)
      assert(waste >= 0 && waste < 1)
    }
  }

  test("ev_cluster_design_effect: ICC in [-1,1], DEFF consistent with N_eff") {
    val rows = SparkEntry.queries("ev_cluster_design_effect")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val k = r.getLong(0); val n = r.getLong(1)
    assert(k > 1 && n > k)
    val icc = r.getDouble(4); val deff = r.getDouble(5); val effN = r.getDouble(6)
    assert(icc >= -1.0 && icc <= 1.0)
    assert(deff > 0)
    assert(math.abs(effN - n / deff) < 1e-3)
    // a positive ICC must shrink the effective sample; a ~zero ICC
    // leaves it ~N
    if (icc > 0.01) assert(effN < n)
  }

  test("er_blocking_sweep: recall is monotone in prefix specificity") {
    val rows = SparkEntry.queries("er_blocking_sweep")(spark, sf).collect()
    assert(rows.length === 6)
    val byScheme = rows.map(r => r.getString(0) -> r).toMap
    assert(byScheme.keySet === Set("prefix4", "prefix8", "prefix12",
      "prefix16", "suffix6", "attrs"))
    // all schemes audit the same truth relation
    assert(rows.map(_.getLong(3)).distinct.length === 1, "n_true per scheme")
    // a SHORTER prefix is a coarser partition: it can only merge blocks,
    // so candidate volume and recall are both monotone non-increasing
    // with prefix length
    def pc(s: String) = byScheme(s).getDouble(5)
    def cand(s: String) = byScheme(s).getLong(2)
    assert(pc("prefix4") >= pc("prefix8") && pc("prefix8") >= pc("prefix12")
      && pc("prefix12") >= pc("prefix16"))
    assert(cand("prefix4") >= cand("prefix8") && cand("prefix8") >= cand("prefix12")
      && cand("prefix12") >= cand("prefix16"))
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1, "pair completeness")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1, "reduction ratio")
      assert(r.getLong(4) <= r.getLong(3), "found <= true")
    }
  }

  test("ev_variance_reduction: CUPED never increases variance; reductions consistent") {
    val rows = SparkEntry.queries("ev_variance_reduction")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("cuped", "raw", "winsorized"))
    val v = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val red = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(v("raw") > 0)
    // Var(Y - thetaX) = Var(Y) - Cov^2/Var(X) <= Var(Y) always
    assert(v("cuped") <= v("raw") + 1e-9)
    // capping at 2*mean can only remove mass above the cap
    assert(v("winsorized") <= v("raw") + 1e-9)
    assert(math.abs(red("raw")) < 1e-9)
    rows.foreach(r => assert(math.abs(
      (1.0 - r.getDouble(1) / v("raw")) - r.getDouble(2)) < 1e-6))
  }

  test("ta_vocab_coverage: coverage is monotone in budget and consistent with OOV") {
    val rows = SparkEntry.queries("ta_vocab_coverage")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 500L, 1000L, 2000L))
    val cov = rows.map(_.getDouble(4))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a - 1e-12 },
      "coverage monotone in budget")
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "types_used <= budget")
      assert(r.getLong(2) <= r.getLong(3), "covered <= total")
      assert(math.abs(r.getDouble(4) + r.getDouble(5) - 1.0) < 1e-9,
        "coverage + oov = 1")
    }
    // all budgets report the same corpus total
    assert(rows.map(_.getLong(3)).distinct.length === 1)
  }

  test("dq_constraint_mining: learned bands contain the training split by construction") {
    val rows = SparkEntry.queries("dq_constraint_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), "lo <= hi")
      assert(r.getLong(4) <= r.getLong(3), "violations <= rows")
      assert(r.getLong(7) <= r.getLong(6), "volume violations <= days")
      val rate = r.getDouble(5)
      assert(rate >= 0 && rate <= 1)
    }
  }

  test("dd_shard_local_recall: recall degrades with shard count toward 1/k") {
    val rows = SparkEntry.queries("dd_shard_local_recall")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(4L, 16L, 64L))
    // same truth relation at every k
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1), "within + missed = total")
      val recall = r.getDouble(4)
      assert(recall >= 0 && recall <= 1)
      // content-blind hash sharding co-locates a pair w.p. 1/k; allow a
      // wide band but pin the order of magnitude (the query's POINT is
      // that this collapses)
      val k = r.getLong(0).toDouble
      assert(recall < math.min(1.0, 6.0 / k) + 0.2,
        s"recall $recall at k=$k looks content-aware; hash sharding shouldn't be")
    }
    val byK = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(byK(4L) >= byK(16L) && byK(16L) >= byK(64L), "recall monotone in k")
  }

  test("dq_ks_drift: D in [0,1]; planted shifted type is flagged, identical is not") {
    val rows = SparkEntry.queries("dq_ks_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0 && d <= 1)
      assert(r.getDouble(4) > 0, "critical value positive")
      assert(r.getBoolean(5) === (d > r.getDouble(4)), "flag consistent with D vs crit")
    }
    // unit pin of the binned-KS core: two identical distributions give
    // D = 0; disjoint supports give D = 1
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sameBins = (0 until 100).map(b => (b, 5L, 5L)).toDF("bin", "ca", "cb")
    val dSame = sameBins
      .withColumn("cuma", sum($"ca").over(
        org.apache.spark.sql.expressions.Window.orderBy($"bin")))
      .withColumn("cumb", sum($"cb").over(
        org.apache.spark.sql.expressions.Window.orderBy($"bin")))
      .agg(max(abs($"cuma" / 500.0 - $"cumb" / 500.0))).head().getDouble(0)
    assert(dSame === 0.0)
  }

  test("mm_av_offset: every planted offset is recovered through both real codecs") {
    val rows = SparkEntry.queries("mm_av_offset")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (id % 11) - 5, "planted offset formula")
      assert(r.getLong(2) >= -8 && r.getLong(2) <= 8, "lag within sweep")
      assert(r.getLong(3) > 0, "peak correlation positive")
      assert(r.getBoolean(4), s"doc $id: estimated ${r.getLong(2)} != planted ${r.getLong(1)}")
    }
    // the fixture exercises the full offset range, both BMP parities
    // and both WAV chunk layouts
    assert(rows.map(_.getLong(1)).distinct.length === 11)
  }

  test("ev_doubly_robust: estimates are finite and DR interpolates its components") {
    val rows = SparkEntry.queries("ev_doubly_robust")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) > 0)
    val dr = r.getDouble(1); val ips = r.getDouble(2); val dm = r.getDouble(3)
    Seq(dr, ips, dm).foreach(v => assert(!v.isNaN && !v.isInfinite && v > 0))
    assert(r.getDouble(4) >= 1.0 / 5 - 1e-9, "max weight sane") // >= pi/max-share
    // DR = DM + IPS-style correction; with a decent q-hat the three
    // estimates agree on order of magnitude
    assert(dr > 0.2 * math.min(ips, dm) && dr < 5 * math.max(ips, dm))
  }

  test("mm_decode_triage: every corruption class is rediscovered by real decode failures") {
    val rows = SparkEntry.queries("mm_decode_triage")(spark, sf).collect()
    val census = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the 9 planted classes collapse to exactly these 9 census cells
    assert(census.keySet === Set(
      ("bmp", "ok"), ("bmp", "bad_magic"),
      ("wav", "ok"), ("wav", "truncated"),
      ("png", "ok"), ("png", "crc_mismatch"), ("png", "truncated"),
      ("jpeg", "ok"), ("jpeg", "truncated")))
    assert(census(("png", "ok")) > 0 && census(("png", "crc_mismatch")) > 0)
    assert(census(("png", "truncated")) > 0)
    assert(census(("wav", "truncated")) > 0 && census(("bmp", "bad_magic")) > 0)
    assert(census(("jpeg", "ok")) > 0 && census(("jpeg", "truncated")) > 0)
    // nothing fell into the parse_error catch-all: every planted
    // corruption maps to its SPECIFIC class
    assert(!rows.exists(_.getString(1) == "parse_error"))
    assert(rows.map(_.getLong(2)).sum ===
      sources.Tables.documents(spark, sf).count())
  }

  test("DecodeTriage.classify maps decoder messages to quarantine classes") {
    import graft.operators.DecodeTriage.classify
    assert(classify("PNG parse: CRC mismatch in tEXt") === "crc_mismatch")
    assert(classify("BMP parse: bad magic") === "bad_magic")
    assert(classify("PNG parse: bad signature") === "bad_magic")
    assert(classify("WAV parse: chunk 'data' overruns RIFF payload") === "truncated")
    assert(classify("PNG parse: truncated chunk header") === "truncated")
    assert(classify("something else entirely") === "parse_error")
    assert(classify(null) === "parse_error")
  }

  test("pl_krippendorff_alpha: alpha sits in the designed imperfect-agreement band") {
    val rows = SparkEntry.queries("pl_krippendorff_alpha")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(1) === r.getLong(0) * 3, "3 ratings per unit")
    assert(r.getLong(2) === 4, "4 categories")
    val alpha = r.getDouble(4)
    // 20% per-rater flip noise over 4 categories: expected pairwise
    // disagreement ~0.27 vs chance ~0.75 -> alpha ~0.6-0.7; assert the
    // designed band generously
    assert(alpha > 0.3 && alpha < 0.95, s"alpha $alpha outside designed band")
    assert(r.getLong(3) > 0, "some disagreement exists")
  }

  test("ev_cluster_design_effect: planted high-ICC clusters are detected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 clusters whose values are constant within cluster: ICC -> 1
    val planted = (0 until 10).flatMap(c => (0 until 20).map(i =>
      (c.toLong, s"e$i", new java.sql.Timestamp(86400000L * i), c * 100.0 + 50)))
      .toDF("user_id", "event_type", "ts", "value")
    val perUser = planted.groupBy($"user_id")
      .agg(count(lit(1)).as("n_i"), sum($"value").as("s_i"))
    val n = 200.0; val kk = 10.0
    val sumT = perUser.select(sum($"s_i" * $"s_i" / $"n_i")).head().getDouble(0)
    val s = perUser.select(sum($"s_i")).head().getDouble(0)
    val sumY2 = planted.select(sum($"value" * $"value")).head().getDouble(0)
    val msb = (sumT - s * s / n) / (kk - 1)
    val msw = (sumY2 - sumT) / (n - kk)
    assert(msw === 0.0, "within-cluster variance must vanish")
    val icc = (msb - msw) / (msb + (20 - 1) * msw)
    assert(icc === 1.0, "constant-within-cluster ICC is exactly 1")
  }
}

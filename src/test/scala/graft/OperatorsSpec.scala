package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Smoke + semantics tests for each operator family at sf0.001.
  * (Full hash-parity vs DuckDB runs via Verify + tools/selfcheck.py.)
  */
class OperatorsSpec extends SparkSpec {

  test("every declared query runs non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query name with an oracle has matching column names") {
    // The driver sorts columns by name before hashing: the Spark result
    // must expose exactly the aliases the oracle SQL emits. Spot-check
    // deterministically orderable output columns are present.
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "count_order"))
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup: minhash-LSH candidates are a superset of high-jaccard pairs") {
    val docs = sources.Tables.documents(spark, sf)
    val full = Dedup.allPairsJaccard(docs, 0.7)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.jaccardForPairs(docs,
        Dedup.lshCandidates(Dedup.minhashSignatures(Dedup.shingles(docs))))
      .filter(col("jac") >= 0.7)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands of 2 rows: P(candidate | jac>=0.7) ≈ 1-(1-0.49)^4 ≈ 0.93 per
    // band pair — on this corpus the planted near-dups all collide.
    assert(lsh == full, s"LSH missed pairs: ${full.diff(lsh)}")
  }

  test("dedup: native jaccard_sim is bit-identical to the composed array_intersect form") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = sources.Tables.documents(spark, sf)
    val arrs = Dedup.shingleArrays(docs)
    val pairs = arrs.as("x").join(arrs.as("y"),
        col("x.doc_id") < col("y.doc_id") && col("y.doc_id") < col("x.doc_id") + 7)
      .select(col("x.shs").as("sha"), col("y.shs").as("shb"))
    val both = pairs.select(
        call_function("jaccard_sim", $"sha", $"shb").as("native"),
        (size(array_intersect($"sha", $"shb")) * lit(1.0) /
          (size($"sha") + size($"shb") - size(array_intersect($"sha", $"shb")))).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // empty ∩ empty is NaN in both formulations (SQL 0/0)
    val edge = Seq((Array.empty[String], Array.empty[String])).toDF("sha", "shb")
      .select(call_function("jaccard_sim", $"sha", $"shb")).head().getDouble(0)
    assert(edge.isNaN)
  }

  test("dedup: native containment_sim is bit-identical to the composed form, and asymmetric") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val arrs = Dedup.shingleArrays(sources.Tables.documents(spark, sf))
    val pairs = arrs.as("x").join(arrs.as("y"),
        col("x.doc_id") < col("y.doc_id") && col("y.doc_id") < col("x.doc_id") + 7)
      .select(col("x.shs").as("sha"), col("y.shs").as("shb"))
    val both = pairs.select(
        call_function("containment_sim", $"sha", $"shb").as("native"),
        (size(array_intersect($"sha", $"shb")) * lit(1.0) / size($"sha")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // subset: contained side scores 1.0, container side |A|/|B|
    val sub = Seq((Array("a_b", "b_c"), Array("a_b", "b_c", "c_d", "d_e"))).toDF("a", "b")
      .select(call_function("containment_sim", $"a", $"b").as("ab"),
        call_function("containment_sim", $"b", $"a").as("ba"))
      .head()
    assert(sub.getDouble(0) == 1.0 && sub.getDouble(1) == 0.5)
  }

  test("dedup: duplicate clusters are consistent with their pair set") {
    val docs = sources.Tables.documents(spark, sf)
    val pairs = Dedup.minhashLshPairs(docs)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.duplicateClusters(docs, Dedup.minhashLshPairs(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc labeled exactly once
    assert(clusters.size == docs.count())
    // both endpoints of every near-dup pair land in the same cluster
    pairs.foreach { case (i, j) =>
      assert(clusters(i)._1 == clusters(j)._1, s"pair ($i,$j) split across clusters")
    }
    // the representative is the cluster's minimum member and in-cluster
    val byRep = clusters.groupBy(_._2._1)
    byRep.foreach { case (rep, members) =>
      assert(members.keys.min == rep)
      assert(members.contains(rep))
      // reported size matches actual membership
      members.values.foreach { case (_, size) => assert(size == members.size) }
    }
    // docs untouched by any pair are singletons
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.foreach { case (d, (rep, size)) =>
      if (!inPairs.contains(d)) assert(rep == d && size == 1)
    }
  }

  test("dedup: prefix filtering equals the exact all-pairs baseline") {
    val docs = sources.Tables.documents(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "jac").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(Dedup.prefixFilterJaccard(docs, 0.7)) ==
      key(Dedup.allPairsJaccard(docs, 0.7)))
  }

  test("dedup: 8-band minhash verification equals the exact baseline") {
    val docs = sources.Tables.documents(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "jac").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = Dedup.jaccardForPairs(docs,
        Dedup.lshCandidates(Dedup.minhashSignatures(Dedup.shingles(docs)), nBands = 8))
      .filter(col("jac") >= 0.7)
    assert(key(banded) == key(Dedup.allPairsJaccard(docs, 0.7)))
  }

  test("dedup: simhash64 banding equals the direct quadratic join") {
    val docs = sources.Tables.documents(spark, sf)
    val sigs = Dedup.simhashSignatures64(docs).cache()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        (bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))) +
          bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi")))).cast("long").as("hamming"))
      .filter(col("hamming") <= 4)
    assert(key(Dedup.simhashPairs64(sigs, 4)) == key(direct))
    sigs.unpersist()
  }

  test("similarity: the HOF cosine fold and native cosine_sim agree, incl. mismatched lengths") {
    // This session has NO optimizer rule injected, so Similarity.cosine
    // genuinely evaluates the zip_with/aggregate fold — the comparison
    // the rewrite's bit-exactness claim rests on.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),          // mismatch → NULL both
      (Array(0.3f, -1.2f, 2f), Array(2f, 0.5f, -0.25f))
    ).toDF("a", "b")
    val plan = df.select(Similarity.cosine(col("a"), col("b"))).queryExecution
      .optimizedPlan.toString
    assert(!plan.contains("cosine_sim"), plan.take(300)) // fold really runs
    val fold = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    val native = df.select(call_function("cosine_sim", col("a"), col("b")).as("c")).collect()
    assert(fold(0).isNullAt(0) && native(0).isNullAt(0))
    assert(java.lang.Double.doubleToLongBits(fold(1).getDouble(0)) ==
      java.lang.Double.doubleToLongBits(native(1).getDouble(0)))
  }

  test("similarity: distributed all-pairs cosine equals the driver-side baseline") {
    val emb = sources.Tables.embeddings(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(Similarity.allPairsCosineDistributed(emb, 0.45)) ==
      key(Similarity.allPairsCosine(emb, 0.45)))
  }

  test("similarity: lsh-bucketed ANN agrees with brute force on top-1 for most queries") {
    val emb = sources.Tables.embeddings(spark, sf)
    val brute = Similarity.cosineTopK(emb, col("vec_id") < 10, 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(brute.size == 10)
    // bucketed path returns plausible neighbors (same bucket constraint);
    // exact agreement isn't guaranteed by LSH — sanity: non-empty per query.
    val bucketed = SparkEntry.queries("sim_lsh_ann")(spark, sf)
      .select("qid").distinct().count()
    assert(bucketed >= 5)
  }

  test("similarity: IVF probes cover every query and bound the searched set") {
    val emb = sources.Tables.embeddings(spark, sf)
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 10, 16, 4, 5).collect()
    assert(ivf.map(_.getLong(0)).distinct.length == 10) // every query answered
    assert(ivf.forall(_.getLong(2) <= 5))
    // assignments partition the corpus: one centroid per vector
    val assigned = Similarity.ivfAssignments(emb, 16)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
  }

  test("similarity: k-means training is bit-deterministic across runs and partitionings") {
    val emb = sources.Tables.embeddings(spark, sf)
    def centroidBits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(java.lang.Float.floatToIntBits).toVector).toMap
    val a = centroidBits(Similarity.kmeansCentroids(emb, k = 8, iters = 2, dim = 64))
    val b = centroidBits(Similarity.kmeansCentroids(emb.repartition(7), k = 8, iters = 2, dim = 64))
    // decimal per-dim means make the result independent of partitioning
    assert(a == b && a.size == 8)
  }

  test("similarity: trained-IVF ANN keeps useful recall@5 vs brute force") {
    val emb = sources.Tables.embeddings(spark, sf)
    def topsets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val brute = topsets(Similarity.cosineTopK(emb, col("vec_id") < 10, 5))
    val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 3, dim = 64)
    val ivf = topsets(Similarity.ivfTopK(emb, col("vec_id") < 10,
      nCentroids = 16, nProbe = 4, k = 5, centroidsOpt = Some(trained)))
    val recalls = brute.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty[Long]) & brute(q)).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    // nProbe = 4 of 16 lists: exactness isn't expected, usefulness is.
    assert(mean >= 0.5, s"mean recall@5 = $mean")
  }

  test("multimodal: fake decoder plumbing emits one feature row per doc") {
    val docs = sources.Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(docs, Multimodal.FakeDecoder)
    assert(feats.count() == docs.count())
    val r = feats.filter(col("doc_id") === 0).head()
    assert(r.getAs[Int]("width") % 16 == 0 && r.getAs[Int]("n_frames") >= 1)
  }

  test("multimodal: resize preserves aspect ratio; frame sampling bounds frames") {
    val docs = sources.Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(docs, Multimodal.FakeDecoder)
    val resized = Multimodal.resizeTo(feats, 256, 256).collect()
    resized.foreach { r =>
      assert(r.getAs[Int]("out_w") <= 256 && r.getAs[Int]("out_h") <= 256)
    }
    val frames = Multimodal.sampleFrames(feats, 4)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 4))
    assert(frames.count() >= feats.count()) // at least one frame per doc
  }

  test("dup-rate datasheet partitions the corpus and bounds the rate") {
    import spark.implicits._
    val rows = Dedup.defs.find(_.name == "dd_dup_rate").get.fn(spark, sf).collect()
    val docs = sources.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique_texts") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dup_rows") < r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate < 1.0)
    }
  }

  test("pq recall: ADC scores the whole corpus and recall is a valid ratio") {
    val rows = SparkEntry.queries("sim_pq_recall")(spark, sf).collect()
    val corpus = sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == 10)
    rows.foreach { r =>
      // PQ compresses vectors, it does not prune candidates: every
      // non-query vector is ADC-scored for every query
      assert(r.getAs[Long]("n_cands") == corpus - 10)
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_hit") == math.round(recall * 5))
    }
  }

  test("sq8 recall: every candidate scored, quantization near-lossless here") {
    val rows = SparkEntry.queries("sim_sq8_recall")(spark, sf).collect()
    val corpus = sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cands") == corpus - 10)
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // measured 1.0 on this corpus (256 uniform levels per dim resolve
    // the neighbor gaps); assert with slack so the spec pins "int8 is
    // cheap compression, not a ranking change" without being brittle
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.8, s"sq8 mean recall degraded: $mean")
  }

  test("dq audit: referential integrity holds, date-order check fires") {
    val rows = SparkEntry.queries("dq_integrity")(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("total"))).toMap
    assert(rows.size == 12)
    // generator guarantees: FKs and PKs are clean
    Seq("lineitem_orderkey_fk", "lineitem_partkey_fk", "lineitem_suppkey_fk",
      "orders_custkey_fk", "orders_orderkey_unique", "customer_custkey_unique")
      .foreach(c => assert(rows(c)._1 == 0L, s"$c should be clean"))
    // generator draws ship dates independently of order dates — the
    // date-order constraint must actually fire (a check that can
    // never fail verifies nothing)
    val (viol, tot) = rows("lineitem_ship_before_order")
    assert(viol > 0 && viol < tot)
  }

  test("cusum stays nonneg, covers every (type, day), ignores partitioning") {
    val base = SparkEntry.queries("ts_cusum")(spark, sf).collect()
    assert(base.nonEmpty)
    base.foreach(r => assert(r.getAs[Double]("s") >= 0.0))
    // per type: t is 1..n_days dense
    base.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("t")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the sequential fold must not depend on input partitioning: the
    // daily aggregate is decimal-exact and the fold sorts per key
    val again = SparkEntry.queries("ts_cusum")(
      spark, sf)
    assert(again.collect().map(_.toString).toSeq == base.map(_.toString).toSeq)
  }

  test("fps diversity: greedy max-cos is nondecreasing and picks are distinct") {
    val rows = SparkEntry.queries("sim_fps_diversity")(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 8)
    // each later pick is chosen from a superset-covered space: its
    // distance-to-set can only shrink, i.e. max_cos never decreases
    val mxs = rows.drop(1).map(_.getAs[Double]("max_cos"))
    assert(mxs.zip(mxs.tail).forall { case (a, b) => b >= a },
      s"greedy k-center max_cos must be nondecreasing: ${mxs.toSeq}")
  }

  test("mmr rerank: 3 distinct picks per query, first pick is the top-1 hit") {
    val rows = SparkEntry.queries("rag_mmr")(spark, sf).collect()
    assert(rows.length == 30)
    // with no picks yet there is no redundancy term, so pick 1 must be
    // the plain cosine top-1 (note: scores are NOT monotone across
    // picks in general — a negative cosine to the selected set acts as
    // a diversity bonus, which is exactly MMR's point)
    val top1 = operators.Similarity
      .cosineTopK(sources.Tables.embeddings(spark, sf), col("vec_id") < 10, 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("nid")).distinct.length == 3, s"qid $q")
      val first = rs.sortBy(_.getAs[Long]("pick")).head.getAs[Long]("nid")
      assert(first == top1(q), s"qid $q: pick1 $first != top1 ${top1(q)}")
    }
  }

  test("importance sample: ~50 PPS picks, strata increase, long docs favored") {
    val rows = SparkEntry.queries("pl_importance_sample")(spark, sf).collect()
    assert(rows.length >= 45 && rows.length <= 50)
    val strata = rows.map(_.getAs[Long]("stratum"))
    assert(strata.zip(strata.tail).forall { case (a, b) => b > a })
    // probability ∝ tokens ⇒ the sample's mean doc length must exceed
    // the corpus mean (size-biased sampling)
    val sampleMean = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble / rows.length
    val corpusMean = sources.Tables.documents(spark, sf)
      .select(avg(size(split(col("text"), " ")))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean, s"$sampleMean !> $corpusMean")
  }

  test("linear interp: gap values lie inside the bracketing envelope") {
    val rows = SparkEntry.queries("ts_linear_interp")(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(rows.exists(_.getAs[Boolean]("gap_filled")))
    byUser.foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getAs[Long]("bucket"))
      val obs = seq.filter(!_.getAs[Boolean]("gap_filled"))
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Double]("v_interp"))
      seq.filter(_.getAs[Boolean]("gap_filled")).foreach { g =>
        val b = g.getAs[Long]("bucket")
        val before = obs.filter(_._1 < b).lastOption
        val after = obs.find(_._1 > b)
        (before, after) match {
          case (Some((_, pv)), Some((_, nv))) =>
            val lo = math.min(pv, nv) - 1e-9; val hi = math.max(pv, nv) + 1e-9
            val v = g.getAs[Double]("v_interp")
            assert(v >= lo && v <= hi, s"bucket $b: $v outside [$lo,$hi]")
          case _ => // edge gaps fall back to ffill/bfill — by construction
        }
      }
    }
  }

  test("csv and orc round-trips preserve row count") {
    // q37/q38's oracle hash-match proves VALUE fidelity; this pins the
    // sink/source row contract at spec speed.
    val li = sources.Tables.lineitem(spark, sf)
    val csvOut = s"/tmp/graft_rt_csv_spec"
    li.select("l_orderkey", "l_returnflag", "l_quantity")
      .write.mode("overwrite").option("header", "true").csv(csvOut)
    val back = spark.read.option("header", "true")
      .schema("l_orderkey LONG, l_returnflag STRING, l_quantity DOUBLE")
      .csv(csvOut)
    assert(back.count() == li.count())
    assert(back.schema.map(_.dataType.simpleString) ==
      Seq("bigint", "string", "double"))
    val orcOut = s"/tmp/graft_rt_orc_spec"
    li.select("l_orderkey", "l_shipdate").write.mode("overwrite").orc(orcOut)
    val back2 = spark.read.orc(orcOut)
    assert(back2.count() == li.count())
    // Spark 4 surfaces the ORC timestamp as TIMESTAMP_NTZ on read-back;
    // wall-clock values agree under the UTC session (q38's hash-match
    // proves it), so accept either flavor here.
    assert(Set("timestamp", "timestamp_ntz")
      .contains(back2.schema("l_shipdate").dataType.simpleString))
  }

  test("skew: salted join returns exactly the plain join's rows") {
    import spark.implicits._
    val orders = sources.Tables.orders(spark, sf)
    val customer = sources.Tables.customer(spark, sf)
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Skew.saltedJoin(orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", 8)
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.sameElements(plain))
  }

  test("globalRank equals the single-partition row_number on every row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // duplicate sort-key values force the doc_id tiebreak across
    // range-shard boundaries
    val df = (1 to 500).map(i => (i.toLong, (i % 17).toLong)).toDF("doc_id", "tok_cnt")
      .repartition(7)
    val got = Pipeline.globalRank(df, Seq($"tok_cnt".desc, $"doc_id"))
      .select($"doc_id", $"rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select($"doc_id",
        (row_number().over(Window.orderBy($"tok_cnt".desc, $"doc_id")) - 1).cast("long").as("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.toSeq.sorted == (0L until 500L))
  }

  test("ts_user_similarity_lsh emits true profile distances, sorted, from same-bucket pairs") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD}
    val rows = SparkEntry.queries("ts_user_similarity_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // sorted by (dist, i, j) like the exact query's output contract
    assert(rows.sliding(2).forall {
      case Array((i1, j1, d1), (i2, j2, d2)) =>
        d1 < d2 || (d1 == d2 && (i1 < i2 || (i1 == i2 && j1 < j2)))
      case _ => true
    })
    // recompute exact 24-dim profile distances driver-side (15 users at
    // sf0.001): per-(user,hour) sums in DECIMAL(18,2) like the query
    val profs = sources.Tables.events(spark, sf)
      .select($"user_id", hour($"ts").as("h"), $"value")
      .collect()
      .groupBy(r => (r.getLong(0), r.getInt(1)))
      .map { case ((u, h), rs) =>
        (u, h) -> rs.map(r => new JBD(r.getDouble(2)).setScale(2, java.math.RoundingMode.HALF_UP))
          .reduce(_.add(_)).doubleValue
      }
    val users = profs.keys.map(_._1).toSeq.distinct
    def prof(u: Long): Array[Double] =
      (0 until 24).map(h => profs.getOrElse((u, h), 0.0)).toArray
    rows.foreach { case (i, j, d) =>
      assert(users.contains(i) && users.contains(j) && i < j)
      val (a, b) = (prof(i), prof(j))
      val exact = math.sqrt((0 until 24).map(h => (a(h) - b(h)) * (a(h) - b(h))).sum)
      assert(math.abs(exact - d) < 1e-9, s"pair ($i,$j): lsh dist $d vs exact $exact")
    }
  }

  test("globalRunningSum equals the single-partition running sum on every row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, ((i * 7) % 23).toLong)).toDF("id", "v")
      .repartition(7)
    val got = Pipeline.globalRunningSum(df, Seq($"v".desc, $"id"), $"v")
      .select($"id", $"run_sum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select($"id",
        sum($"v").over(Window.orderBy($"v".desc, $"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("rs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalPrefixMax equals the single-partition strict prefix max on every row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, ((i * 13) % 31).toLong)).toDF("id", "v")
      .repartition(7)
    val got = Pipeline.globalPrefixMax(df, Seq($"v".desc, $"id"), $"v")
      .select($"id", $"pre_max").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = df.select($"id",
        max($"v").over(Window.orderBy($"v".desc, $"id")
          .rowsBetween(Window.unboundedPreceding, -1)).as("pm"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q09_top_events_by_value")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("dimension joins broadcast (q06 has no shuffle on the fact side)") {
    val plan = SparkEntry.queries("q06_region_acctbal")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("column profile never plans an Expand of the fact table") {
    // seven COUNT(DISTINCT)s in one aggregation would plan as an 8x
    // Expand (measured 10.7s vs 1.7s at sf0.1) - the melt formulation
    // must keep it out of the plan
    val plan = SparkEntry.queries("q33_column_profile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(800))
  }

  test("filter pushdown reaches parquet (q02 PushedFilters non-empty)") {
    val plan = SparkEntry.queries("q02_filter_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      plan.take(800))
  }
}

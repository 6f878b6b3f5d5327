package graft

/** Margin-mining pins: every mined pair clears the margin bar, pairs
  * cross sides (even label → odd label), and the candidate join is
  * IVF-bucketed (equi-join, no cross product).
  */
class BitextSpec extends SparkSpec {

  test("mined pairs clear the margin bar and cross sides") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("sim_margin_bitext")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 1.05, s"margin ${r.getDouble(3)} <= 1.05")
      assert(r.getLong(2) > 0, "mined pair with non-positive cosine")
    }
    val emb = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(emb(r.getLong(0)) % 2 == 0 && emb(r.getLong(1)) % 2 == 1,
        "pair does not cross the even/odd split")
    }
  }

  test("adaptive twin: identical to fixed-K at driver scale, K derived from n past it") {
    import org.apache.spark.sql.functions._
    // At every shipped fixture GREATEST(16, n DIV 128) resolves to 16,
    // so the adaptive twin must return bit-identical rows to the fixed
    // one — the gx_triangles_adaptive contract.
    val fixedRows = SparkEntry.queries("sim_margin_bitext")(spark, sf).collect()
    val adaptRows = SparkEntry.queries("sim_margin_bitext_adaptive")(spark, sf).collect()
    assert(fixedRows.toSeq == adaptRows.toSeq)
    // Past the floor, K grows with the corpus: 2560 one-hot vectors in
    // 20 residue classes → nk = max(16, 2560/128) = 20 and every class
    // c < 20 is its own nearest centroid, so centroid ids ≥ 16 appear —
    // which the fixed assignment can never emit.
    val emb = spark.range(2560).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 31), i -> CAST(CASE WHEN i = id % 20 THEN 1.0 ELSE 0.0 END AS FLOAT))").as("embedding"))
    val assigned = operators.Similarity.ivfAssignTopAdaptive(emb, 16, 128, 1)
    val maxCent = assigned.agg(max(col("centroid"))).head.getLong(0)
    assert(maxCent == 19L, s"expected adaptive K=20 to assign centroid 19, max was $maxCent")
  }

  test("candidate generation is bucketed, not a cross product") {
    val plan = SparkEntry.queries("sim_margin_bitext")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the pair join must be the centroid-bucketed equi-join; the only
    // nested-loop nodes allowed are ivfAssignTop's bounded 16-row
    // centroid-block crosses (every vector scores 16 centroids — a
    // broadcast dimension, same as sim_dbscan / the ivf ann family)
    val smj = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(smj >= 1, s"expected a shuffled pair equi-join, plan:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the dataset card and range similarity
  * search, on the real sf0.001 tables. The oracles pin exact values;
  * these pin the laws downstream curation relies on (conservation
  * against the corpus, radius completeness), so a rework can't keep
  * the hash while breaking the contract.
  */
class CorpusCardSpec extends SparkSpec {

  test("dataset card: strata partition the corpus (doc and token " +
    "conservation) and the median sits inside each stratum's range") {
    import spark.implicits._
    val card = operators.CorpusStats.defs
      .find(_.name == "pl_dataset_card").get.fn(spark, sf).localCheckpoint()
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("tok"))
    val (nDocs, nTok) = docs.agg(count(lit(1)), sum($"tok"))
      .as[(Long, Long)].head()
    val (cDocs, cTok) = card.agg(sum($"n_docs"), sum($"tok_sum"))
      .as[(Long, Long)].head()
    assert(cDocs == nDocs)
    assert(cTok == nTok)
    // per-stratum: mean and p50 within [1, tok_sum], id span ordered
    assert(card.filter($"tok_mean" <= 0.0 || $"tok_p50" <= 0.0 ||
      $"first_doc" > $"last_doc" ||
      $"tok_mean" > $"tok_sum" || $"tok_p50" > $"tok_sum").count() == 0L)
  }

  test("range search: exactly the pairs at cosine >= tau, verified " +
    "against an independent per-pair recompute") {
    import spark.implicits._
    val out = operators.RangeSearch.defs.head.fn(spark, sf).localCheckpoint()
    assert(out.filter($"cos" < 0.3).count() == 0L)
    assert(out.filter($"qid" >= 5 || $"vec_id" < 5).count() == 0L)
    // completeness + exactness: recompute the full radius set with a
    // plain SQL cross join over the same table
    val emb = sources.Tables.embeddings(spark, sf)
    emb.createOrReplaceTempView("e_rs")
    functions.GraftFunctions.register(spark)
    val truth = spark.sql("""
      SELECT q.vec_id AS qid, c.vec_id AS vec_id
      FROM e_rs q JOIN e_rs c ON q.vec_id < 5 AND c.vec_id >= 5
      WHERE cosine_sim(q.embedding, c.embedding) >= 0.3""")
    assert(out.select($"qid", $"vec_id").exceptAll(truth).count() == 0L)
    assert(truth.exceptAll(out.select($"qid", $"vec_id")).count() == 0L)
  }
}

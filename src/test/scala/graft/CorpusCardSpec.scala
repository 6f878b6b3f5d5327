package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the n-gram novelty curve, the dataset
  * card, and range similarity search, on the real sf0.001 tables. The
  * oracles pin exact values; these pin the laws downstream curation
  * relies on (conservation against the corpus, probability bounds,
  * radius completeness), so a rework can't keep the hash while
  * breaking the contract.
  */
class CorpusCardSpec extends SparkSpec {

  test("ngram novelty: bounds hold, the first doc is fully novel, and " +
    "novel-gram totals conserve the corpus-wide distinct-trigram count") {
    import spark.implicits._
    val out = operators.CorpusStats.defs
      .find(_.name == "ta_ngram_novelty").get.fn(spark, sf).localCheckpoint()
    assert(out.filter($"n_novel" > $"n_grams" || $"n_novel" < 0 ||
      $"novelty" < 0.0 || $"novelty" > 1.0).count() == 0L)
    // the smallest doc_id in the output sees every one of its grams first
    val first = out.orderBy($"doc_id").select($"novelty").as[Double].head()
    assert(first == 1.0)
    // every distinct trigram is novel in exactly one doc (its min-doc),
    // so Σ n_novel over docs = corpus-wide distinct trigram count
    val grams = sources.Tables.documents(spark, sf)
      .select(split($"text", " ").as("tk"))
      .filter(size($"tk") >= 3)
      .select(explode(array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> concat_ws(char(1), tk[i-1], tk[i], tk[i+1]))"))).as("g"))
    val nDistinct = grams.distinct().count()
    val sumNovel = out.agg(sum($"n_novel")).as[Long].head()
    assert(sumNovel == nDistinct)
  }

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

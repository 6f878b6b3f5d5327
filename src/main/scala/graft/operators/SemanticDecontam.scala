package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (paraphrase-visible) decontamination — the SemDeDup-style
  * extension of [[Decontam]] (r10 verdict #5): `pl_decontam_spans`
  * only sees VERBATIM leakage (its anchors are exact 8-grams), so an
  * eval span that was lightly rewritten — words substituted, clauses
  * reordered — sails through. This audit makes that visible:
  *
  *  1. '''Embed''' every document as a deterministic hashed-TF vector
  *     (dim 16, portable md5 hash so the oracle computes bit-identical
  *     vectors — [[graft.functions.PortableHash.h32]]). At production
  *     scale this column is the real neural embedding; everything
  *     downstream is representation-agnostic.
  *  2. '''Bucket''' with the same distributed k-means the `sim_` IVF
  *     family trains ([[Similarity.kmeansCentroids]] /
  *     [[Similarity.kmeansSqlCte]]) — the SemDeDup device that turns
  *     the all-pairs candidate search into k independent (n/k)²
  *     problems. K is COMPILE-TIME FIXED here (8) because the unrolled
  *     oracle CTE needs a literal k, so bucket occupancy — and with it
  *     in-bucket pair work — grows with the corpus; at production
  *     scale k must derive from n to hold occupancy constant, the
  *     measured device of [[Similarity.ivfAssignTopAdaptive]] /
  *     `sim_margin_bitext_adaptive` (r11 verdict #1).
  *  3. '''Candidates''' are eval×train pairs INSIDE a bucket whose
  *     doc-level cosine clears τ — never all-pairs; the eval slice
  *     (doc_id % 41 = 7, the split every decontam query uses) is the
  *     small side and AQE broadcast-flips it.
  *  4. '''Window audit''': slide a 16-token window (stride 8) over
  *     each candidate eval doc and flag windows whose distinct-BIGRAM
  *     containment in the candidate train doc is ≥ 3/5 — bigrams make
  *     the test order-sensitive enough to reject topical coincidence
  *     (this corpus's unigram vocabulary is so small that unigram
  *     containment saturates) while surviving word substitutions that
  *     break the exact audit's 8-gram anchors. The flag is the integer
  *     predicate 5·|win∩train| ≥ 3·|win| — no float thresholds.
  *  5. '''Report''' through the exact family's interval machinery
  *     ([[Decontam.mergeIntervals]]): flagged windows merge into
  *     disjoint per-doc regions, so the output is the same
  *     covered/regions/flag shape as `pl_decontam_spans` and the two
  *     audits diff cleanly (semantic ⊇ exact wherever a verbatim span
  *     fills a window).
  *
  * Scale shape: one corpus-sized shuffle to build bigram sets, the
  * k-means trainer's bounded scans, a bucketed candidate join, and a
  * per-candidate window join whose fan-out is (windows per eval doc) ×
  * (candidate mates) — both bounded by the bucketing. Train bigram
  * sets are per-doc rows (bounded by doc length), never broadcast
  * corpus-wide. Windows are row-local expressions; both windows in the
  * interval merge are partitioned by doc.
  */
object SemanticDecontam {

  private val evalMod = 41L
  private val evalRes = 7L
  /** embedding dim — small so the unrolled oracle k-means stays cheap */
  private val D = 16
  private val K = 8
  private val ITERS = 2
  /** window length / stride (tokens) */
  private val W = 16
  private val S = 8
  /** doc-level cosine gate for candidate pairs, applied inside buckets */
  private val TAU = 0.5

  /** Hashed-TF document embeddings: vec_id = doc_id, embedding =
    * float[D] of per-bucket token counts. Counts are small exact
    * integers, so float vs double representation is exact in both
    * engines and cosine comparisons can't diverge in the last ulp. */
  private def docEmbeddings(docs: DataFrame): DataFrame = {
    // ONE exchange, one codegen'd aggregate (r12 verdict #6): the
    // (doc_id, bucket) → doc_id two-groupBy chain cost a second
    // exchange plus an interpreted map_from_entries/element_at
    // assembly; D conditional sums per doc_id (the pxGrid/SimHash vote
    // shape) compute the same per-bucket counts with map-side partial
    // aggregation and a plain array() projection. The doc_id-keyed
    // repartition BEFORE the explode both spreads the md5-per-token
    // work past the corpus scan's few file splits (§2.5) and is the
    // exact partitioning the groupBy needs, so no further exchange.
    // Counts are small exact integers either way — bit-identical to
    // the oracle's unnest + GROUP BY derivation.
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toks = docs
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val b = pmod(PortableHash.h32(col("tok")), lit(D.toLong)).cast("int")
    toks.groupBy(col("doc_id")).agg(
      sum(when(b === 0, 1.0).otherwise(0.0)).as("c0"),
      (1 until D).map(j =>
        sum(when(b === j, 1.0).otherwise(0.0)).as(s"c$j")): _*)
      .select(col("doc_id").as("vec_id"),
        array((0 until D).map(j => col(s"c$j").cast("float")): _*)
          .as("embedding"))
  }

  /** (doc_id, pos, bigram) rows, one pass over the token array —
    * the same single-pass discipline as [[Decontam.gram8Udf]]. */
  private val bigramUdf = udf { text: String =>
    if (text == null) null
    else {
      val tk = text.split(" ", -1)
      if (tk.length < 2) null
      else {
        val out = new Array[(Int, String)](tk.length - 1)
        var i = 0
        while (i + 1 < tk.length) {
          out(i) = (i, tk(i) + "_" + tk(i + 1))
          i += 1
        }
        out
      }
    }
  }

  private val oracleSql = s"""
    WITH dtok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    dcnt AS (
      SELECT doc_id, CAST(${PortableHash.sqlH32("tok")} % $D AS INT) AS b,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM dtok GROUP BY doc_id, b),
    demb AS (
      SELECT doc_id AS vec_id,
             list(CAST(COALESCE(q.c, 0.0) AS REAL) ORDER BY q.j) AS embedding
      FROM (
        SELECT d.doc_id, r.j, c.c
        FROM (SELECT DISTINCT doc_id FROM dcnt) d
        CROSS JOIN range(0, $D) r(j)
        LEFT JOIN dcnt c ON c.doc_id = d.doc_id AND c.b = r.j) q
      GROUP BY doc_id),
    ${Similarity.kmeansSqlCte(K, ITERS, D, src = "demb")},
    asg AS (
      SELECT vec_id, centroid FROM (
        SELECT e.vec_id, c.centroid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) DESC,
                          c.centroid) AS rn
        FROM demb e, cents c)
      WHERE rn = 1),
    cand AS (
      SELECT a.vec_id AS e_doc, b.vec_id AS t_doc
      FROM asg a
      JOIN asg b ON a.centroid = b.centroid
      JOIN demb ea ON ea.vec_id = a.vec_id
      JOIN demb eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id % $evalMod = $evalRes
        AND b.vec_id % $evalMod <> $evalRes
        AND list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= $TAU),
    bg AS (
      SELECT doc_id, i AS pos, tk[i] || '_' || tk[i+1] AS bigram
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) q,
           UNNEST(range(1, len(tk))) AS r(i)),
    tset AS (
      SELECT doc_id AS t_doc, list(DISTINCT bigram) AS tb
      FROM bg WHERE doc_id % $evalMod <> $evalRes GROUP BY doc_id),
    base AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE doc_id % $evalMod = $evalRes),
    win AS (
      SELECT b.doc_id AS e_doc, s.s,
             LEAST(s.s + $W - 1, b.n_tokens) AS e
      FROM base b,
           UNNEST(CASE WHEN b.n_tokens >= $W
                       THEN range(1, b.n_tokens - $W + 2, $S)
                       ELSE [CAST(1 AS BIGINT)] END) AS s(s)),
    wset AS (
      SELECT w.e_doc, w.s, w.e, list(DISTINCT g.bigram) AS wb
      FROM win w JOIN bg g
        ON g.doc_id = w.e_doc AND g.pos BETWEEN w.s AND w.e - 1
      GROUP BY w.e_doc, w.s, w.e),
    hits AS (
      SELECT DISTINCT w.e_doc, w.s, w.e
      FROM wset w
      JOIN cand c ON c.e_doc = w.e_doc
      JOIN tset t ON t.t_doc = c.t_doc
      WHERE 5 * len(list_intersect(w.wb, t.tb)) >= 3 * len(w.wb)),
    ord AS (
      SELECT e_doc, s, e,
             MAX(e) OVER (PARTITION BY e_doc ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM hits),
    isl AS (
      SELECT e_doc, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY e_doc ORDER BY s, e) AS island
      FROM ord),
    merged AS (
      SELECT e_doc, island, MIN(s) AS s, MAX(e) AS e
      FROM isl GROUP BY e_doc, island),
    cov AS (
      SELECT e_doc, COUNT(*) AS n_regions, SUM(e - s + 1) AS covered
      FROM merged GROUP BY e_doc),
    nc AS (
      SELECT e_doc, COUNT(*) AS n_candidates FROM cand GROUP BY e_doc)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(c.covered, 0) AS BIGINT) AS sem_covered,
           CAST(COALESCE(c.n_regions, 0) AS BIGINT) AS n_regions,
           5 * COALESCE(c.covered, 0) > b.n_tokens AS contaminated
    FROM base b
    LEFT JOIN cov c ON c.e_doc = b.doc_id
    LEFT JOIN nc n ON n.e_doc = b.doc_id
    ORDER BY b.doc_id
  """.trim

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_decontam_semantic",
      Some(oracleSql),
      (s, d) => {
        val docs = documents(s, d)
        val demb = docEmbeddings(docs).localCheckpoint()
        // literal trainer + shuffle-free assignment (r11 verdict #3):
        // the model is k·dim driver floats by contract, so both the
        // per-iteration argmax and the final assignment are projections
        val cents = Similarity.kmeansCentroidsLocal(demb, K, ITERS, D)
        val asg = Similarity.assignLiteral(demb, cents)
        val ev = asg.filter(col("vec_id") % evalMod === evalRes)
          .select(col("centroid"), col("vec_id").as("e_doc"),
            col("embedding").as("ee"))
        val tr = asg.filter(col("vec_id") % evalMod =!= evalRes)
          .select(col("centroid"), col("vec_id").as("t_doc"),
            col("embedding").as("te"))
        val cand = ev.join(tr, Seq("centroid"))
          .filter(Similarity.cosineNative(col("ee"), col("te")) >= TAU)
          .select(col("e_doc"), col("t_doc"))
          .localCheckpoint()
        val bg = docs
          .select(col("doc_id"), explode(bigramUdf(col("text"))).as("pg"))
          .select(col("doc_id"), col("pg._1").as("pos"), col("pg._2").as("bigram"))
        val base = docs.filter(col("doc_id") % evalMod === evalRes)
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
        // docs shorter than one window get a single whole-doc window —
        // without it a fully-leaked short doc is invisible (the sf0.001
        // fixture's doc 89: 15 verbatim tokens, zero 16-token windows)
        val win = base
          .select(col("doc_id").as("e_doc"),
            explode(expr(s"CASE WHEN n_tokens >= $W " +
              s"THEN sequence(0, n_tokens - $W, $S) ELSE array(0) END")).as("s"),
            col("n_tokens"))
          .select(col("e_doc"), col("s"),
            least(col("s") + (W - 1), col("n_tokens") - 1).as("e"))
        // Containment as ROWS, not arrays: the first formulation built
        // per-window and per-train-doc bigram SETS and filtered with
        // array_intersect — byte-small inputs, so AQE coalesced the
        // join to ONE partition and paid ~440k quadratic-cost array
        // intersections on a single task (profiled: one 5.1 s stage
        // carrying 76% of the query). Exploding window bigrams and
        // counting matches through an equi-join on (t_doc, bigram) is
        // the same predicate as pure hash joins + hash aggregates —
        // parallel at any scale, no per-row set scans. The oracle keeps
        // the list formulation (results are identical; DuckDB
        // parallelizes it fine).
        // winB feeds both the window-size aggregate and the fan-out
        // join; it is deliberately NOT checkpointed — a LogicalRDD
        // leaf reports unknown (∞) stats, which demoted the cand/trB
        // broadcasts to sort-merge joins and serialized the fan-out
        // (profiled: two 1.5 s single-task SMJ stages vs one 1.0 s
        // 32-task hash-join stage). The duplicate explode+distinct the
        // double consumption costs is the cheaper side of that trade.
        val winB = win.join(bg.withColumnRenamed("doc_id", "e_doc"), Seq("e_doc"))
          .filter(col("pos").between(col("s"), col("e") - 1))
          .select(col("e_doc"), col("s"), col("e"), col("bigram"))
          .distinct()
        val wsize = winB.groupBy(col("e_doc"), col("s"), col("e"))
          .agg(count(lit(1)).as("wsize"))
        val trB = bg.filter(col("doc_id") % evalMod =!= evalRes)
          .select(col("doc_id").as("t_doc"), col("bigram")).distinct()
        // Match bigrams FIRST, filter to candidate pairs AFTER (guide
        // §2.3 aggregate-before-join / §3.3 join order). The old order
        // fanned every window-bigram by the eval doc's ~n/K candidate
        // mates BEFORE matching — ~45M rows at sf0.1 but, because the
        // fixed K=8 makes in-bucket pair volume quadratic in corpus
        // size, ~4.6B rows at sf1 (profiled: two ~67 s 32-task stages,
        // the refreshed sf1 artifact's newly-flagged row). The
        // bigram-keyed join's volume is Σ_b wf(b)·df(b) instead —
        // measured 57M doc-level rows at sf1 (DuckDB on the regen'd
        // fixture), ~50× less — and pairs sharing zero bigrams simply
        // never appear: their isect would be 0, which can never pass
        // 5·isect ≥ 3·wsize (wsize ≥ 1), so the left-semi candidate
        // filter AFTER the count is result-identical to fanning by
        // cand first. Oracle unchanged and green.
        val hits = winB
          .join(trB, Seq("bigram"))
          .groupBy(col("e_doc"), col("s"), col("e"), col("t_doc"))
          .agg(count(lit(1)).as("isect"))
          .join(cand, Seq("e_doc", "t_doc"), "left_semi")
          .join(wsize, Seq("e_doc", "s", "e"))
          .filter(lit(5) * col("isect") >= lit(3) * col("wsize"))
          .select(col("e_doc"), col("s"), col("e"))
          .distinct()
        val cov = Decontam.mergeIntervals(hits)
          .groupBy(col("e_doc"))
          .agg(count(lit(1)).as("n_regions"),
            sum(col("e") - col("s") + 1).as("covered"))
          .withColumnRenamed("e_doc", "doc_id")
        val nc = cand.groupBy(col("e_doc").as("doc_id"))
          .agg(count(lit(1)).as("n_candidates"))
        base.join(cov, Seq("doc_id"), "left")
          .join(nc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            col("n_tokens").cast("long").as("n_tokens"),
            coalesce(col("n_candidates"), lit(0L)).cast("long").as("n_candidates"),
            coalesce(col("covered"), lit(0L)).cast("long").as("sem_covered"),
            coalesce(col("n_regions"), lit(0L)).cast("long").as("n_regions"),
            (lit(5) * coalesce(col("covered"), lit(0L)) > col("n_tokens"))
              .as("contaminated"))
          .orderBy(col("doc_id"))
      }))
}

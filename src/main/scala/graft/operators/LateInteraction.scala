package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia,
  * SIGIR'20): score(q, d) = Σ_{t∈q} max_{t'∈d} cos(E(t), E(t')) —
  * token-level MaxSim, the retrieval quality step between single-vector
  * cosine ([[Similarity]]) and cross-encoders.
  *
  * Two stages, the production pipeline shape: a cheap FIRST-stage
  * candidate generator (distinct-token-overlap counts — one token
  * equi-join + a per-query top-50, all integer arithmetic) bounds the
  * expensive stage, then exact MaxSim runs ONLY on |Q|·50 candidates —
  * the token-pair fan-out is |Q|·50·|q_toks|·|d_toks| however large
  * the corpus grows, never corpus-quadratic. At 100 TB the first stage
  * is the inverted-index/ANN probe; the MaxSim stage is unchanged.
  *
  * Token embeddings are the deterministic md5 integer features the
  * multimodal CLIP seam uses (4 dims, % 997): dots and norms are exact
  * integer sums, cos is one double division, and the per-query-token
  * MaxSim values snap to a 1e-9 grid before the DECIMAL-free integer
  * SUM — so the cross-token accumulation is order-independent and the
  * oracle matches bit-for-bit.
  */
object LateInteraction {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "rag_late_interaction", {
        val dims = (0 until 4).map(i =>
          s"CAST(('0x' || substr(md5(tok || ':$i'), 1, 8))::UBIGINT AS BIGINT) % 997 AS e$i")
          .mkString(", ")
        Some(s"""
          WITH qt AS (
            SELECT doc_id AS qid, tok, $dims FROM (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents WHERE doc_id < 5)),
          dt AS (
            SELECT doc_id AS nid, tok, $dims FROM (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents WHERE doc_id >= 5)),
          overlap AS (
            SELECT q.qid, d.nid, CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM qt q JOIN dt d ON q.tok = d.tok
            GROUP BY 1, 2),
          cand AS (
            SELECT qid, nid, n_overlap FROM (
              SELECT qid, nid, n_overlap,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY n_overlap DESC, nid) AS rn
              FROM overlap)
            WHERE rn <= 50),
          sims AS (
            SELECT c.qid, c.nid, q.tok AS qtok,
                   MAX(CAST(q.e0*d.e0 + q.e1*d.e1 + q.e2*d.e2 + q.e3*d.e3 AS DOUBLE)
                       / (sqrt(CAST(q.e0*q.e0 + q.e1*q.e1 + q.e2*q.e2 + q.e3*q.e3 AS DOUBLE))
                          * sqrt(CAST(d.e0*d.e0 + d.e1*d.e1 + d.e2*d.e2 + d.e3*d.e3 AS DOUBLE)))) AS maxsim
            FROM cand c
            JOIN qt q ON q.qid = c.qid
            JOIN dt d ON d.nid = c.nid
            GROUP BY 1, 2, 3),
          scores AS (
            SELECT qid, nid,
                   CAST(SUM(CAST(floor(maxsim * CAST(1000000000.0 AS DOUBLE)
                                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s9
            FROM sims GROUP BY 1, 2)
          SELECT s.qid, s.nid, CAST(rnk AS BIGINT) AS rank,
                 c.n_overlap,
                 s.s9 / CAST(1000000000.0 AS DOUBLE) AS score
          FROM (
            SELECT qid, nid, s9,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s9 DESC, nid) AS rnk
            FROM scores) s
          JOIN cand c ON c.qid = s.qid AND c.nid = s.nid
          WHERE rnk <= 3
          ORDER BY s.qid, rnk
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        def dims(prefix: String) = (0 until 4).map(i =>
          (graft.functions.PortableHash.h32(concat($"tok", lit(s":$i"))) % 997)
            .as(s"$prefix$i"))
        def toks(pred: org.apache.spark.sql.Column, idName: String) =
          documents(s, d).filter(pred)
            .select($"doc_id".as(idName),
              explode(array_distinct(split($"text", " "))).as("tok"))
        val qt = broadcast(toks($"doc_id" < 5, "qid")
          .select($"qid" +: $"tok" +: dims("q"): _*))
        val dt = toks($"doc_id" >= 5, "nid")
          .select($"nid" +: $"tok" +: dims("d"): _*)
        val overlap = dt.join(qt.select($"qid", $"tok"), "tok")
          .groupBy($"qid", $"nid").agg(count(lit(1)).as("n_overlap"))
        val wc = Window.partitionBy($"qid").orderBy($"n_overlap".desc, $"nid")
        val cand = overlap.withColumn("rn", row_number().over(wc))
          .filter($"rn" <= 50).select($"qid", $"nid", $"n_overlap")
          .localCheckpoint() // feeds the MaxSim join AND the readout
        val dp = (0 until 4).map(i => col(s"q$i") * col(s"d$i")).reduce(_ + _)
        val nq = (0 until 4).map(i => col(s"q$i") * col(s"q$i")).reduce(_ + _)
        val nd = (0 until 4).map(i => col(s"d$i") * col(s"d$i")).reduce(_ + _)
        val sims = cand.select($"qid", $"nid")
          .join(dt, "nid")
          .withColumnRenamed("tok", "dtok")
          .join(qt.withColumnRenamed("tok", "qtok"), "qid")
          .select($"qid", $"nid", $"qtok",
            (dp.cast("double")
              / (sqrt(nq.cast("double")) * sqrt(nd.cast("double")))).as("cos"))
          .groupBy($"qid", $"nid", $"qtok").agg(max($"cos").as("maxsim"))
        val scores = sims.groupBy($"qid", $"nid")
          .agg(sum(floor($"maxsim" * lit(1000000000.0) + lit(0.5)).cast("long"))
            .as("s9"))
        val wr = Window.partitionBy($"qid").orderBy($"s9".desc, $"nid")
        scores.withColumn("rnk", row_number().over(wr))
          .filter($"rnk" <= 3)
          .join(cand, Seq("qid", "nid"))
          .select($"qid", $"nid", $"rnk".cast("long").as("rank"),
            $"n_overlap", ($"s9" / lit(1000000000.0)).as("score"))
          .orderBy($"qid", $"rank")
      }))
}

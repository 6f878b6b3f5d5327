package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Train/val/test split leakage audit — the eval-integrity check every
  * benchmark-conscious corpus runs: after an 80/10/10 content-hash
  * split, how many near-duplicate pairs (the banded-MinHash ≥ 0.7
  * operator, dd_minhash_lsh verbatim) cross a split boundary? A
  * near-dup of a test document sitting in train is silent eval
  * contamination that exact-match decontamination
  * (pl_decontaminate's n-gram overlap) misses.
  *
  * The split is content-addressed (md5 of the text, the portable h32),
  * so it is reproducible across engines and immune to doc-id
  * renumbering — and precisely BECAUSE it is content-hashed, exact
  * duplicates can never leak (same text ⇒ same split); everything the
  * audit finds is a true near-dup leak. Dataflow: the LSH pair table
  * (banded candidates + distributed verify — nothing quadratic) joined
  * to the per-doc split labels, rolled up to the 3×3 split matrix.
  */
object Leakage {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "pl_split_leakage",
      Some(s"""
        WITH ${Dedup.sqlLshPairsCtes("documents")},
        split AS (
          SELECT doc_id,
                 CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id, ${PortableHash.sqlH32("text")} % 10 AS b FROM documents)),
        px AS (
          SELECT least(si.split, sj.split) AS split_a,
                 greatest(si.split, sj.split) AS split_b
          FROM pairs p
          JOIN split si ON si.doc_id = p.i
          JOIN split sj ON sj.doc_id = p.j)
        SELECT split_a, split_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               split_a <> split_b AS leaked
        FROM px
        GROUP BY split_a, split_b
        ORDER BY split_a, split_b
      """.trim),
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val split = docs.select($"doc_id",
          (PortableHash.h32($"text") % 10).as("b"))
          .select($"doc_id",
            when($"b" < 8, "train").when($"b" === 8, "val").otherwise("test")
              .as("split"))
        val pairs = Dedup.minhashLshPairs(docs.select($"doc_id", $"text"))
        pairs
          .join(split.select($"doc_id".as("i"), $"split".as("si")), "i")
          .join(split.select($"doc_id".as("j"), $"split".as("sj")), "j")
          .select(least($"si", $"sj").as("split_a"),
            greatest($"si", $"sj").as("split_b"))
          .groupBy($"split_a", $"split_b")
          .agg(count(lit(1)).cast("long").as("n_pairs"))
          .select($"split_a", $"split_b", $"n_pairs",
            ($"split_a" =!= $"split_b").as("leaked"))
          .orderBy($"split_a", $"split_b")
      }))
}

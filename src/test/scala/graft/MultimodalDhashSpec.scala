package graft

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

/** Properties of the perceptual-hash (dHash) image-dedup family and
  * the cross-modal plumbing built on it. */
class MultimodalDhashSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("identical payloads hash to identical signatures (hamming 0)") {
    val docs = docsOf(Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again")))
    val pairs = Dedup.simhashPairs64(Multimodal.dhashSignatures(docs), 4)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("hamming") == 0L)
  }

  test("a one-word edit moves few pixels: small hamming, still a candidate") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok20", "zok20")
    val docs = docsOf(Seq((0L, base), (1L, edited)))
    val pairs = Dedup.simhashPairs64(Multimodal.dhashSignatures(docs), 4)
      .collect()
    assert(pairs.length == 1, "one edited shingle must not break banding recall")
    assert(pairs.head.getAs[Long]("hamming") <= 4L)
  }

  test("unrelated payloads are far apart and produce no pair") {
    val a = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 40).map(i => s"beta$i").mkString(" ")
    val pairs = Dedup.simhashPairs64(
      Multimodal.dhashSignatures(docsOf(Seq((0L, a), (1L, b)))), 4).collect()
    assert(pairs.isEmpty)
  }

  test("banded pairs == direct all-pairs at hamming <= 4 (exact recall)") {
    val docs = sources.Tables.documents(spark, sf)
    val sigs = Multimodal.dhashSignatures(docs).cache()
    val banded = Dedup.simhashPairs64(sigs, 4)
      .select("i", "j", "hamming").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        (bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))) +
          bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sigs.unpersist()
    assert(banded == direct)
    assert(direct.nonEmpty, "the corpus must exercise the dedup path")
  }

  test("clip retrieval: rank 1..3 per query, cos non-increasing in rank") {
    val out = SparkEntry.queries("mm_clip_retrieval")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L))
      val byRank = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}

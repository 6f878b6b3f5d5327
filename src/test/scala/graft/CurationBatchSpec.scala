package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the span-dedup / compaction-plan /
  * blocking-quality batch, on the real sf0.001 tables. The oracles pin
  * exact values; these pin the LAWS that make the outputs usable by a
  * downstream pipeline (conservation, contiguity, bound validity), so
  * a future rework can't silently keep the hash while changing the
  * contract.
  */
class CurationBatchSpec extends SparkSpec {

  test("span dedup: segment accounting conserves, and kept count " +
    "equals the corpus-wide distinct-segment count") {
    import spark.implicits._
    val out = operators.LineDedup.defs.head.fn(spark, sf).localCheckpoint()
    val bad = out.filter($"n_kept" > $"n_seg" || $"n_kept" < 0).count()
    assert(bad == 0L)
    // Σ n_kept = number of distinct 10-word segments (each distinct
    // segment is kept exactly once, at its first occurrence)
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("wl"))
    val segs = docs.select($"doc_id",
        explode(sequence(lit(0L), ((size($"wl") - 1) / 10).cast("long"))).as("g"),
        $"wl")
      .select(array_join(slice($"wl", ($"g" * 10 + 1).cast("int"), lit(10)), " ")
        .as("seg"))
    val nDistinct = segs.distinct().count()
    val nTotal = segs.count()
    val (sumSeg, sumKept) = out.agg(sum($"n_seg"), sum($"n_kept"))
      .as[(Long, Long)].head()
    assert(sumSeg == nTotal)
    assert(sumKept == nDistinct)
  }

  test("compaction plan: per-source files are contiguous, doc ranges " +
    "are disjoint, and every non-final file ends at or past its " +
    "target boundary") {
    import spark.implicits._
    val plan = operators.Compaction.defs.head.fn(spark, sf).localCheckpoint()
    val rows = plan.orderBy($"source", $"file_id")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_._2)
      // file ids 0..n-1 with no gaps
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      // doc ranges strictly increasing across files
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5)
        case _ =>
      }
      // next-fit law: file f holds exactly the docs whose start offset
      // is in [f*500, (f+1)*500), so the running token total after any
      // non-final file must have reached that file's upper boundary
      var run = 0L
      sorted.dropRight(1).foreach { f =>
        run += f._4
        assert(run >= (f._2 + 1) * 500,
          s"file ${f._2} of ${f._1} ends at $run < ${(f._2 + 1) * 500}")
      }
    }
    // conservation: plan token total == corpus token total
    val planTok = rows.map(_._4).sum
    val corpusTok = sources.Tables.documents(spark, sf)
      .select(size(split($"text", " ")).cast("long").as("t"))
      .agg(sum($"t")).as[Long].head()
    assert(planTok == corpusTok)
  }

  test("blocking quality: counts agree with a materialized candidate " +
    "set and the ratios are valid probabilities") {
    import spark.implicits._
    val row = operators.EntityRes.defs
      .find(_.name == "er_blocking_quality").get.fn(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val (nBlocks, nCand, nTrue, nFound, pc, rr) = row
    assert(nFound <= nTrue)
    assert(pc >= 0.0 && pc <= 1.0)
    assert(rr >= 0.0 && rr <= 1.0)
    // at sf0.001 the candidate set is small enough to materialize: the
    // block-size formula must equal the real pair count
    val blk = sources.Tables.customer(spark, sf)
      .select($"c_custkey", substring($"c_name", 1, 16).as("k"))
    val mat = blk.as("x").join(blk.as("y"),
        col("x.k") === col("y.k") &&
          col("x.c_custkey") < col("y.c_custkey")).count()
    assert(nCand == mat)
    assert(nBlocks == blk.select($"k").distinct().count())
  }
}

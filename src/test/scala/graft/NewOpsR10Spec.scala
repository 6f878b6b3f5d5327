package graft

/** Pins for the round-10 additions: exact substring-span
  * decontamination (the anchored-diagonal suffix-array replacement)
  * and the reg-discontinuity degenerate-side guard.
  */
class NewOpsR10Spec extends SparkSpec {

  test("pl_decontam_spans: coverage invariants and a real cross-split leak") {
    val rows = SparkEntry.queries("pl_decontam_spans")(spark, sf).collect()
    // one row per eval doc, including zero-hit docs
    assert(rows.length === 13)
    rows.foreach { r =>
      val (n, cov, regions, longest) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cov >= 0 && cov <= n, s"coverage within the doc: $cov of $n")
      assert(longest <= cov, "the longest exact span is part of the coverage")
      // an exact span is at least one full 8-gram anchor long
      assert(cov == 0 || longest >= 8, s"spans are >= 8 tokens, got $longest")
      assert((regions == 0) == (cov == 0), "regions and coverage agree on emptiness")
      assert(regions <= cov / 8 + 1, "each merged region covers >= 8 tokens")
      // flag is the integer predicate, restated
      assert(r.getBoolean(5) === (5 * cov > n))
    }
    // the planted near-dup families leak across the %41 split: the
    // audit must actually find verbatim spans, not report all-zeros
    assert(rows.map(_.getLong(2)).sum > 0, "no exact spans found at all")
  }

  test("pl_decontam_scrub: kept + covered partition every doc's tokens") {
    val scrub = SparkEntry.queries("pl_decontam_scrub")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val spans = SparkEntry.queries("pl_decontam_spans")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrub.keySet === spans.keySet)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    scrub.foreach { case (doc, (n, kept, md5)) =>
      // the scrub deletes EXACTLY the covered tokens — the two queries
      // must partition each doc between them
      assert(kept + spans(doc) === n, s"doc $doc: $kept kept + ${spans(doc)} covered != $n")
      assert((kept == 0) === (md5 == emptyMd5), s"doc $doc empty-hash consistency")
      assert(md5.length === 32 && md5.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    }
    // at least one doc must actually lose tokens, and not all of them
    assert(scrub.values.exists { case (n, kept, _) => kept < n })
    assert(scrub.values.exists { case (_, kept, _) => kept > 0 })
  }

  test("dd_exact_substr: exact-duplicate docs are fully covered, invariants hold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("dd_exact_substr")(spark, sf).collect()
    assert(rows.nonEmpty, "the planted dup families must surface shared spans")
    val byDoc = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    byDoc.foreach { case (doc, (n, dup, regions, fully)) =>
      assert(dup >= 8 && dup <= n, s"doc $doc: dup span coverage $dup of $n")
      assert(regions >= 1 && regions <= dup / 8 + 1)
      assert(fully === (dup == n))
    }
    // cross-pin vs the hash dedup: every doc whose md5(text) collides
    // with another doc (and is long enough to carry an 8-gram anchor)
    // is a verbatim copy — ExactSubstr must report it FULLY covered
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).as("n"))
    val dupIds = docs.alias("x").join(docs.alias("y"),
        col("x.h") === col("y.h") && col("x.doc_id") =!= col("y.doc_id"), "left_semi")
      .filter(col("n") >= 8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // sf0.001 plants near-dups but no byte-identical pairs; the md5
    // cross-pin only binds where the fixture has them (sf0.01: 24 docs)
    dupIds.foreach { id =>
      assert(byDoc.contains(id) && byDoc(id)._4, s"exact-dup doc $id must be fully_dup")
    }
  }

  test("ev_reg_discontinuity: runs at sf0.001 where one side is degenerate") {
    // latent since birth, found by the r10 CodegenTriage sweep: at
    // sf0.001 one side's windowed users all share one score, the
    // x-variance is exactly 0 and the un-guarded ANSI double division
    // threw DIVIDE_BY_ZERO — but only under full materialization
    // (count()-shaped gates pruned the projection away). collect()
    // forces every output column.
    val rows = SparkEntry.queries("ev_reg_discontinuity")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite, "at_cutoff finite")
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite, "slope finite")
    }
  }
}

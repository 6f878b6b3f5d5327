package graft

/** Pins for the round-11 addition: the SemDeDup-style semantic
  * decontamination audit (`pl_decontam_semantic`).
  */
class NewOpsR11Spec extends SparkSpec {

  test("pl_decontam_semantic: invariants, and semantic ⊇ exact on window-filling spans") {
    val rows = SparkEntry.queries("pl_decontam_semantic")(spark, sf).collect()
    // one row per eval doc (same %41 split as the exact family)
    assert(rows.length === 13)
    rows.foreach { r =>
      val (n, cands, cov, regions) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cov >= 0 && cov <= n, s"coverage within the doc: $cov of $n")
      assert((regions == 0) == (cov == 0), "regions and coverage agree on emptiness")
      // every merged region is at least one full window long (short
      // docs get one whole-doc window, so their floor is the doc)
      assert(cov == 0 || cov >= math.min(16, n), s"regions are >= min(16, n) tokens, got $cov of $n")
      // no candidates -> nothing can be covered
      assert(cands > 0 || cov == 0, "coverage without any candidate pair")
      assert(r.getBoolean(5) === (5 * cov > n))
    }
    // the planted near-dup families leak across the split: the audit
    // must flag something, not report all-zeros
    assert(rows.map(_.getLong(3)).sum > 0, "no semantic spans found at all")

    // a verbatim leak that fills a whole window is a paraphrase leak
    // with zero edits — docs whose EXACT coverage spans a full window
    // should also surface here (weaker: semantic coverage nonzero)
    val exact = SparkEntry.queries("pl_decontam_spans")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // longest_exact
    val sem = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    val fullWindowDocs = exact.filter(_._2 >= 31).keySet // spans >= 2 windows
    fullWindowDocs.foreach { doc =>
      assert(sem(doc) > 0,
        s"doc $doc has a ${exact(doc)}-token verbatim span but zero semantic coverage")
    }
  }
}

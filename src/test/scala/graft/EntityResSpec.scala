package graft

import org.apache.spark.sql.functions._

/** Entity-resolution pins:
  *
  *  - the deletion-neighborhood candidate join (FastSS) must return
  *    EXACTLY the brute-force all-pairs edit-1 set — completeness is
  *    the whole point of the construction, so it's asserted against
  *    the quadratic formulation the production plan never runs;
  *  - the candidate generation must plan an equi-join (no
  *    CartesianProduct / nested-loop fallback);
  *  - cluster representatives are the component minima (min-label
  *    fixpoint semantics), and entity sizes tally back to the
  *    customer count;
  *  - Fellegi–Sunter weights: full agreement dominates any pair with
  *    a disagreement (the u-probabilities estimated from the data
  *    make each agreement odds-increasing).
  */
class EntityResSpec extends SparkSpec {

  test("deletion-neighborhood pairs == brute-force edit-1 pairs") {
    val cust = sources.Tables.customer(spark, sf)
    val fast = SparkEntry.queries("er_edit1_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val names = cust.select(col("c_custkey"), col("c_name"))
    val brute = names.as("x").join(names.as("y"),
        col("x.c_custkey") < col("y.c_custkey") &&
          levenshtein(col("x.c_name"), col("y.c_name")) <= 1)
      .select(col("x.c_custkey"), col("y.c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(fast.nonEmpty)
  }

  test("candidate generation is an equi-join, not a cross product") {
    val plan = SparkEntry.queries("er_edit1_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("entity clusters: reps are component minima, sizes tally") {
    val rows = SparkEntry.queries("er_entity_clusters")(spark, sf).collect()
    val n = sources.Tables.customer(spark, sf).count()
    assert(rows.length == n)
    val byRep = rows.groupBy(_.getLong(1))
    byRep.foreach { case (rep, members) =>
      assert(members.map(_.getLong(0)).min == rep,
        s"rep $rep is not its component's minimum")
      assert(members.forall(_.getLong(2) == members.length))
    }
    assert(rows.map(_.getLong(0)).distinct.length == n)
  }

  test("edit2 lookup == brute-force edit<=2 probe join") {
    val cust = sources.Tables.customer(spark, sf)
    val fast = SparkEntry.queries("er_edit2_lookup")(spark, sf)
      .select("p_custkey", "r_custkey", "lev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probes = cust.filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey").as("p"), col("c_name").as("pn"))
    val reg = cust.filter(col("c_custkey") % 50 =!= 0)
      .select(col("c_custkey").as("r"), col("c_name").as("rn"))
    val brute = probes.join(reg,
        levenshtein(col("pn"), col("rn")) <= 2)
      .select(col("p"), col("r"),
        levenshtein(col("pn"), col("rn")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(fast.nonEmpty)
    assert(fast.exists(_._3 == 2L), "fixture should exercise distance-2 matches")
  }

  test("registry admission: verdicts match a per-record recomputation") {
    val cust = sources.Tables.customer(spark, sf)
    val rows = SparkEntry.queries("er_incremental")(spark, sf).collect()
    val batchN = cust.filter(col("c_custkey") % 5 === 0).count()
    assert(rows.length == batchN)
    // new records have no best_match; matched ones have one <= any match
    rows.foreach { r =>
      val isNew = r.getBoolean(3)
      if (isNew) {
        assert(r.getLong(1) == 0L && r.isNullAt(2))
      } else {
        assert(r.getLong(1) > 0L && !r.isNullAt(2))
      }
    }
    assert(rows.exists(!_.getBoolean(3)), "fixture should have matches")
  }

  test("Fellegi-Sunter: full agreement outweighs any disagreement") {
    val rows = SparkEntry.queries("er_fellegi_sunter")(spark, sf).collect()
    assert(rows.nonEmpty)
    val full = rows.filter(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)).map(_.getDouble(5))
    val partial = rows.filterNot(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)).map(_.getDouble(5))
    if (full.nonEmpty && partial.nonEmpty)
      assert(full.min > partial.max,
        s"full-agreement min ${full.min} <= partial max ${partial.max}")
    val decisions = rows.map(_.getString(6)).toSet
    assert(decisions.subsetOf(Set("match", "possible", "non_match")))
  }
}

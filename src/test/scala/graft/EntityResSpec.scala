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

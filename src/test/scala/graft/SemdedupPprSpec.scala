package graft

import graft.operators.{Ppr, Semdedup, Similarity}
import org.apache.spark.sql.functions._

/** Structural invariants of the round-5 semantic-dedup and
  * personalized-PageRank operators, checked on the real sf0.001
  * tables (the oracle queries pin exact values; these pin the
  * properties that make the answers MEANINGFUL). */
class SemdedupPprSpec extends SparkSpec {

  test("semdedup: surviving cluster-mates are all below the threshold, " +
    "and every dropped doc has a smaller-id mate above it") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").localCheckpoint()
    val cents = Similarity.kmeansCentroids(emb, 16, 2, 64)
    val asg = Similarity.ivfAssignments(emb, 16, Some(cents))
      .select($"vec_id", $"embedding", $"centroid").localCheckpoint()
    val a = asg.select($"centroid", $"vec_id".as("i"), $"embedding".as("ei"))
    val b = asg.select($"centroid", $"vec_id".as("j"), $"embedding".as("ej"))
    val pairs = a.join(b, Seq("centroid")).filter($"i" < $"j")
      .select($"i", $"j",
        Similarity.cosineNative($"ei", $"ej").as("cos"))
      .localCheckpoint()
    val dropped = pairs.filter($"cos" >= 0.4).select($"j").distinct()
      .as[Long].collect().toSet

    // keep-lowest-id greedy: a pair with BOTH endpoints kept must sit
    // below the threshold (otherwise the larger id would be dropped)
    val survivorsAbove = pairs.filter($"cos" >= 0.4)
      .filter(!$"j".isin(dropped.toSeq: _*))
      .count()
    assert(survivorsAbove == 0)

    // and the query's per-cluster accounting sums to the same drop set
    val byCluster = Semdedup.defs.head.fn(spark, sf)
      .agg(sum($"n_dropped")).as[Long].head()
    assert(byCluster == dropped.size)
  }

  test("ppr: scores form a probability mass concentrated on the seed side") {
    import spark.implicits._
    // full (unlimited) score table via the library function on the
    // same graph the query uses
    val e0 = sources.Tables.orders(spark, sf)
      .join(sources.Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val seeds = deg.select($"src".as("node"), $"deg")
      .orderBy($"deg".desc, $"node").limit(5).select($"node")
    val scores = Ppr.ppr(edges, seeds, 5, 3, 0.85)
    val (total, negatives) = scores
      .agg(sum($"pr"), sum(when($"pr" < 0.0, 1).otherwise(0)))
      .as[(Double, Long)].head()
    // teleport + spread conserve mass on a symmetric graph (no dangling
    // nodes): Σpr stays 1 up to the snap9 grid (each edge contribution
    // is snapped to 1e-9 for cross-engine decimal parity, so the drift
    // bound is |E|·iters·5e-10 — 1e-5 covers it with margin)
    assert(math.abs(total - 1.0) < 1e-5 && negatives == 0)

    // seeds retain the teleport floor — each scores at least (1-d)/|S|
    val seedIds = seeds.as[Long].collect().toSet
    val seedMin = scores.filter($"node".isin(seedIds.toSeq: _*))
      .agg(min($"pr")).as[Double].head()
    assert(seedMin >= (1.0 - 0.85) / 5)
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the model-eval queries (pl_quality_auc /
  * pl_quality_calibration) beyond the DuckDB oracle:
  *
  *  - the range-sharded Mann–Whitney rank machinery (globalRunningSum
  *    + per-source offsets) must equal the textbook single-partition
  *    average-rank formulation — the equality that lets the scale-safe
  *    plan stand in for the naive one;
  *  - AUC invariants: num ≤ den, AUC ∈ [0, 1] where defined, NULL
  *    exactly on single-class sources;
  *  - the calibration table partitions the corpus (Σ n_docs = |docs|,
  *    n_pos ≤ n_docs per bin).
  */
class QualityEvalSpec extends SparkSpec {

  test("range-sharded AUC equals the naive average-rank formulation") {
    import spark.implicits._
    val got = SparkEntry.queries("pl_quality_auc")(spark, sf)
      .select($"source", $"auc").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    // naive: avg rank over a per-source single-partition window,
    // built on the SAME scored-with-label projection the production
    // query uses — this test pins ONLY the rank machinery, so it
    // cannot vacuously pass if the feature chain is edited in both
    // copies but drifts from pl_quality_model
    val feats = graft.operators.Pipeline.modelScoredWithLabel(spark, sf)
    val wr = Window.partitionBy($"source").orderBy($"score")
    val wt = Window.partitionBy($"source", $"score")
    val ranked = feats
      .withColumn("avg_rank",
        rank().over(wr).cast("double")
          + (count(lit(1)).over(wt).cast("double") - 1.0) / 2.0)
    val naive = ranked.groupBy($"source")
      .agg(sum($"y").as("np"), (count(lit(1)) - sum($"y")).as("nn"),
        sum(when($"y" === 1L, $"avg_rank")).as("rs"))
      .collect()
      .map { r =>
        val (np, nn) = (r.getLong(1), r.getLong(2))
        r.getString(0) -> (if (np == 0 || nn == 0) None
          else Some((r.getDouble(3) - np.toDouble * (np + 1) / 2.0) / (np.toDouble * nn)))
      }.toMap

    assert(got.keySet == naive.keySet)
    for ((src, n) <- naive) (got(src), n) match {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$src: $a vs $b")
      case (a, b) => assert(a == b, s"$src: $a vs $b")
    }
  }

  test("AUC invariants: num <= den, range [0,1], NULL iff single-class") {
    val rows = SparkEntry.queries("pl_quality_auc")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (np, nn) = (r.getLong(2), r.getLong(3))
      val (num, den) = (r.getDouble(4), r.getDouble(5))
      assert(num >= 0.0 && num <= den, r.toString)
      if (np == 0 || nn == 0) assert(r.isNullAt(6), r.toString)
      else {
        val auc = r.getDouble(6)
        assert(auc >= 0.0 && auc <= 1.0, r.toString)
        assert(math.abs(auc - num / den) < 1e-15, r.toString)
      }
    }
  }

  test("calibration bins partition the corpus") {
    val rows = SparkEntry.queries("pl_quality_calibration")(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    for (r <- rows) {
      assert(r.getLong(3) <= r.getLong(2), r.toString)
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0, r.toString)
    }
  }
}

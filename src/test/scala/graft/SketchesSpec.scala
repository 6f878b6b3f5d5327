package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Bloom-filter table invariants (exact counts are pinned by the
  * sk_bloom DuckDB oracle; these pin the structural guarantees). */
class SketchesSpec extends SparkSpec {

  test("bloom probe has zero false negatives and bounded bits") {
    import spark.implicits._
    val members = (1 to 200).map(i => s"m$i").toDF("key")
    val bits = Sketches.bloomBuild(members)
    val nBits = bits.count()
    assert(nBits <= Sketches.m, s"$nBits set bits exceed m=${Sketches.m}")
    assert(nBits >= 200, "k hashes per member must set at least n bits total")

    val probe = ((1 to 200).map(i => s"m$i" -> true) ++
      (1 to 200).map(i => s"x$i" -> false)).toDF("key", "exact_in")
    val res = Sketches.bloomProbe(probe, bits)
    assert(res.filter($"exact_in" && !$"bloom_hit").count() == 0, "false negative")
    // with n=400 probes into m=2048/k=4 some negatives must still miss
    assert(res.filter(!$"exact_in" && !$"bloom_hit").count() > 0,
      "filter rejects nothing — degenerate saturation")
  }

  test("count-min never undercounts and is exact for isolated keys") {
    import spark.implicits._
    // zipf-ish: key i appears 201-i times, so counts span 1..200
    val stream = (1 to 200).flatMap(i => Seq.fill(201 - i)(s"k$i")).toDF("key")
    val cm = Sketches.cmBuild(stream)
    assert(cm.count() <= Sketches.cmDepth.toLong * Sketches.cmWidth)
    val exact = stream.groupBy($"key").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmEstimate(exact, cm)
    assert(est.filter($"cm_est" < $"exact").count() == 0, "undercount")
    // absent keys estimate 0 unless every hash row collides
    val absent = Sketches.cmEstimate(Seq("zzz-absent").toDF("key"), cm)
      .select($"cm_est").as[Long].head()
    assert(absent <= 5, s"absent-key estimate $absent suspiciously large")
  }

  test("count-min maintained as a streaming aggregation converges to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the CM build IS a streaming-maintainable aggregation: same
    // explode + groupBy count in update mode, fed incrementally
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val keys = (1 to 300).map(i => s"k${i % 37}")
    stream.addData(keys.take(150))
    stream.addData(keys.drop(150))
    val q = Sketches.cmBuild(stream.toDF.toDF("key")).writeStream
      .format("memory").queryName("cm_stream").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cm_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.cmBuild(keys.toDF("key"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("multi-table LSH table 0 equals the single-table buckets") {
    import spark.implicits._
    // lshBucketsMulti's planes t*bits..t*bits+bits-1 must reduce to
    // lshBuckets for (tables=1, bits=8) — the recall harness's bucket
    // family stays anchored to the oracle-pinned single-table one
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val single = operators.Similarity.lshBuckets(emb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = operators.Similarity.lshBucketsMulti(emb, 1, 8)
      .select($"vec_id", $"bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == multi)
    assert(single.nonEmpty)
  }

  test("bit table is partitioning-invariant") {
    import spark.implicits._
    val members = (1 to 100).map(i => s"k$i").toDF("key")
    val a = Sketches.bloomBuild(members).as[Long].collect().sorted.toSeq
    val b = Sketches.bloomBuild(members.repartition(7)).as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}

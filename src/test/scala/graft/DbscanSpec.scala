package graft

import graft.operators.{Dbscan, Similarity}
import org.apache.spark.sql.functions._

/** DBSCAN structural invariants on the real sf0.001 embeddings: the
  * oracle pins exact values; these pin the definitional properties
  * (Ester et al. KDD'96) against an independently recomputed
  * ε-neighbor relation, so a refactor of the candidate machinery
  * cannot silently change what "core/border/noise" means. */
class DbscanSpec extends SparkSpec {

  test("dbscan: core/border/noise satisfy the degree and " +
    "core-neighbor definitions, and edges never cross clusters") {
    import spark.implicits._
    val emb = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").localCheckpoint()
    // the same ε-relation the operator classifies over (cos ≥ 0.3 on
    // IVF-bucket candidates, k=16, nAssign=3)
    val pairs = Similarity.ivfNearDupPairs(emb, 16, 3, 0.3)
      .select($"i", $"j")
    val sym = pairs.select($"i".as("u"), $"j".as("v"))
      .union(pairs.select($"j".as("u"), $"i".as("v")))
      .localCheckpoint()
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("nd"))

    val cls = Dbscan.classify(emb).localCheckpoint()

    // degree law: core ⇔ nd ≥ 4 (minPts)
    val degViol = cls.join(deg, cls("vec_id") === deg("u"), "left")
      .select($"point_type", coalesce($"nd", lit(0L)).as("nd"))
      .filter(($"point_type" === "core" && $"nd" < 4) ||
        ($"point_type" =!= "core" && $"nd" >= 4))
      .count()
    assert(degViol == 0L)

    // border ⇒ has a core neighbor; noise ⇒ has none
    val coreIds = cls.filter($"point_type" === "core").select($"vec_id".as("v"))
    val hasCoreNbr = sym.join(coreIds, Seq("v"), "left_semi")
      .select($"u".as("vec_id")).distinct()
    val borderNoCore = cls.filter($"point_type" === "border")
      .join(hasCoreNbr, Seq("vec_id"), "left_anti").count()
    val noiseWithCore = cls.filter($"point_type" === "noise")
      .join(hasCoreNbr, Seq("vec_id"), "left_semi").count()
    assert(borderNoCore == 0L)
    assert(noiseWithCore == 0L)

    // cluster soundness: a core-core ε-edge never crosses clusters,
    // noise carries the -1 sentinel, non-noise a real representative
    val lab = cls.filter($"point_type" === "core")
      .select($"vec_id", $"cluster")
    val crossEdges = sym
      .join(lab.select($"vec_id".as("u"), $"cluster".as("cu")), Seq("u"))
      .join(lab.select($"vec_id".as("v"), $"cluster".as("cv")), Seq("v"))
      .filter($"cu" =!= $"cv").count()
    assert(crossEdges == 0L)
    val badSentinel = cls.filter(
      ($"point_type" === "noise" && $"cluster" =!= -1L) ||
        ($"point_type" =!= "noise" && $"cluster" < 0L)).count()
    assert(badSentinel == 0L)

    // the clustering is non-degenerate on this corpus: some of each
    val kinds = cls.groupBy($"point_type").count()
      .as[(String, Long)].collect().toMap
    assert(kinds.getOrElse("core", 0L) > 0L)
    assert(kinds.getOrElse("noise", 0L) > 0L)
  }
}

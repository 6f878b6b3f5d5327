package graft

import graft.operators.Similarity
import graft.plans.RewriteCosine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The optimizer rule must rewrite exactly the HOF cosine shape —
  * nothing else — and be bit-exact. Uses its own session so the
  * extension-injected rule is exercised end-to-end.
  */
class RewriteCosineSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Build over the shared SparkContext but with our extensions: clear
  // the default session so the builder makes a fresh one, and restore
  // afterwards. NEVER stop() here — that would kill the shared context.
  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
    .master("local[2]")
    .appName("rewrite-cosine-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    saved.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("HOF cosine is rewritten to the native expression by the injected rule") {
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") === col("b.vec_id") - 1)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"), optimized.take(800))
    assert(!optimized.contains("aggregate("), optimized.take(800))
  }

  test("rewrite is bit-exact vs the unoptimized fold") {
    val joined = emb.as("a").join(emb.as("b"), col("a.vec_id") === col("b.vec_id") - 7)
    val viaRule = joined
      .select(col("a.vec_id"), Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = joined
      .select(col("a.vec_id"),
        org.apache.spark.sql.functions.call_function("cosine_sim",
          col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule.keySet == direct.keySet && viaRule.nonEmpty)
    viaRule.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(direct(k)))
    }
  }

  test("the rewritten expression is NULL on length-mismatched arrays") {
    // Both columns here go through the injected rule (this session has
    // extensions), so this pins the NATIVE null semantics; the genuine
    // fold-vs-native comparison lives in OperatorsSpec, whose shared
    // session has no optimizer rule and so evaluates the real HOF fold.
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),          // mismatch → NULL
      (Array(1f, 2f), Array(3f, 4f))               // match → value
    ).toDF("a", "b")
    val viaRule = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    val native = df.select(call_function("cosine_sim", col("a"), col("b")).as("c")).collect()
    assert(viaRule(0).isNullAt(0) && native(0).isNullAt(0))
    assert(java.lang.Double.doubleToLongBits(viaRule(1).getDouble(0)) ==
      java.lang.Double.doubleToLongBits(native(1).getDouble(0)))
  }

  test("composed Jaccard shape is rewritten to jaccard_sim and agrees in value") {
    // parquet-backed input — literal rows would be constant-folded into
    // a LocalRelation before the rule could be observed
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("sa"),
        split(substring(col("text"), 1, 60), " ").as("sb"))
    def composed = (size(array_intersect(col("sa"), col("sb"))) * lit(1.0) /
      (size(col("sa")) + size(col("sb")) - size(array_intersect(col("sa"), col("sb"))))).as("j")
    val q = docs.select(col("doc_id"), composed)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("jaccard_sim"), optimized.take(600))
    // value parity: rewritten result equals the explicit native call
    val viaRule = q.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = docs.select(col("doc_id"),
        call_function("jaccard_sim", col("sa"), col("sb")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule.nonEmpty && viaRule.keySet == native.keySet)
    viaRule.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(native(k)))
    }
    // numerator-only (no union-size denominator) must NOT be rewritten
    val partial = docs.select((size(array_intersect(col("sa"), col("sb"))) * lit(1.0)).as("x"))
    assert(!partial.queryExecution.optimizedPlan.toString.contains("jaccard_sim"))
  }

  test("a merely similar expression is NOT rewritten") {
    // dot without the norm divisor — must stay a HOF aggregate
    val df = emb.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), optimized.take(400))
  }

  test("the rule object applies standalone on a plan") {
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < 2 && col("b.vec_id") < 2)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    val rewritten = RewriteCosine(df.queryExecution.analyzed)
    assert(rewritten.toString.contains("cosine_sim"))
  }
}

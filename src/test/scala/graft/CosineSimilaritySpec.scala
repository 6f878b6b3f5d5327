package graft

import graft.functions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native codegen expression must be bit-identical to the
  * higher-order-function formulation it replaces (the oracle hash
  * compare tolerates zero ULP drift).
  */
class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim is bit-identical to the aggregate/zip_with fold") {
    GraftFunctions.register(spark)
    val emb = sources.Tables.embeddings(spark, sf)
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 20)
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("hof"),
        Similarity.cosineNative(col("a.embedding"), col("b.embedding")).as("native"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"hof=${r.getDouble(0)} native=${r.getDouble(1)}")
    }
  }

  test("cosine_sim is callable from SQL after registration") {
    GraftFunctions.register(spark)
    sources.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
         FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id = 1""").collect()
    assert(n.length == 1 && math.abs(n.head.getDouble(0)) <= 1.0000001)
  }

  test("cosine_sim participates in whole-stage codegen (no codegen barrier)") {
    GraftFunctions.register(spark)
    // raw scan (no repartition Exchange) so the pre-AQE plan shows
    // codegen stage markers
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = emb.select(
      Similarity.cosineNative(col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.0)
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[cosine_sim".r.findFirstIn(plan).isDefined, plan.take(600))
    // and the generated code actually contains our emitted loop
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("getFloat"), code.take(600))
  }
}

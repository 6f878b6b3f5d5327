package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The custom top-k strategy must produce exactly the Window
  * formulation's rows (including ranks) while planning the two-phase
  * physical operator. Own session so the injected strategy is active.
  */
class TopKStrategySpec extends AnyFunSuite with BeforeAndAfterAll {

  // Build over the shared SparkContext but with our extensions: clear
  // the default session so the builder makes a fresh one, and restore
  // afterwards. NEVER stop() here — that would kill the shared context.
  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
    .master("local[4]")
    .appName("topk-strategy-spec")
    .config("spark.sql.shuffle.partitions", "4")
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

  private def topKQuery(s: SparkSession) = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    s.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
  }

  test("the pattern plans TopKPartialExec + TopKFinalExec") {
    val plan = topKQuery(spark).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan.take(1200))
    assert(plan.contains("TopKFinal"), plan.take(1200))
    assert(!plan.contains("Window ["), plan.take(1200))      // no WindowExec
    assert(!plan.contains("WindowGroupLimit"), plan.take(1200)) // built-in prune subsumed
  }

  test("operator is partitioning-invariant (skewed and random layouts)") {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy($"o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val out = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      assert(out.queryExecution.executedPlan.toString.contains("TopKFinal"))
      out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    val a = run(base.repartition(1))
    val b = run(base.repartition(17, $"o_orderkey")) // keys scattered across partitions
    val c = run(base.repartition(5, $"o_custkey"))   // keys co-located
    assert(a == b && b == c && a.nonEmpty)
  }

  test("randomized: operator equals a scala reference across keys/k/layouts") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 500 + rng.nextInt(1500)
      val nKeys = 1 + rng.nextInt(40)
      val k = 1 + rng.nextInt(5)
      // unique ord values → total order → deterministic ranks
      val ords = rng.shuffle((1 to n).toList)
      val rows = ords.zipWithIndex.map { case (ord, i) =>
        (rng.nextInt(nKeys).toLong, i.toLong, ord.toDouble)
      }
      val df = rows.toDF("key", "id", "ord").repartition(1 + rng.nextInt(8))
      val w = Window.partitionBy($"key").orderBy(desc("ord"))
      val got = df.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val expected = rows.groupBy(_._1).iterator.flatMap { case (key, rs) =>
        rs.sortBy(-_._3).take(k).zipWithIndex.map { case ((_, id, _), i) => (key, id, i + 1) }
      }.toSet
      assert(got == expected, s"trial=$trial n=$n keys=$nKeys k=$k")
    }
  }

  test("results equal the Window formulation exactly, ranks included") {
    val got = topKQuery(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // independent reference: plain-Scala top-3 per customer
    val rows = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).iterator.flatMap { case (c, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, ok, tp), i) => (c, ok, tp, i + 1) }
    }.toSet
    assert(got == expected && got.nonEmpty)
    assert(got.groupBy(_._1).forall(_._2.size <= 3))
  }
}

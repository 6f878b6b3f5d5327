package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet readers so the first measured query
    // doesn't absorb one-time session init (~3 s of classloading).
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("ta_fingerprint").foreach(fn => fn(spark, sfDir).count())
    // sorted order: deterministic across rounds, comparable per-query.
    // noop sink, not count(): count() lets Catalyst prune every
    // projected column, so expression-heavy queries would measure a
    // bare row count instead of their real work. Each query runs once
    // unmeasured (Catalyst planning + Janino codegen compile are
    // per-plan one-time costs) and the second, steady-state run is
    // reported — standard warm-measurement methodology.
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    // Median of nRuns measured runs (after one unmeasured warm run):
    // single-run times swing ±20% on a busy 32-thread JVM, and the
    // per-query numbers feed round-over-round regression tracking.
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(v => v.trim.toIntOption).getOrElse(3).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      runOnce(fn)
      val times = Seq.fill(nRuns) {
        val t0 = System.nanoTime()
        runOnce(fn)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

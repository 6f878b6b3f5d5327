package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Micro-benchmark for the fused k-means iteration's stage
  * formulations (round-12 triage evidence, kept for future trainer
  * work): times each candidate 5× over the cached sf0.1 embeddings
  * corpus. This is the measurement behind two r12 findings —
  * select(expensive, posexplode) evaluates the expensive expression
  * per EXPLODED row (fix: withColumn barrier, 839 → 226 ms median),
  * and array_min(array(structs)) is interpreted where least(structs…)
  * is codegen (359 → 82 ms). Usage: runMain graft.TrainerBench [sfDir]. */
object TrainerBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .repartition(4).persist()
    emb.count()
    val k = 16; val dim = 64
    val cents: Seq[(Long, Seq[Float])] = emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toSeq)).sortBy(_._1).toSeq

    def cos(c: org.apache.spark.sql.Column, v: Seq[Float]) =
      call_function("cosine_sim", c, typedLit(v))
    def argmin(e: org.apache.spark.sql.Column) =
      array_min(array(cents.map { case (cid, v) =>
        struct((-cos(e, v)).as("nc"), lit(cid).as("centroid"))
      }: _*)).getField("centroid")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-40s median ${ts.sorted.apply(2)}%8.1f ms  (${ts.map(t => f"$t%.0f").mkString(",")})")
    }

    // a: argmin projection alone
    time("argmin projection only") {
      emb.select(argmin(col("embedding")).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // b: posexplode alone
    time("posexplode only") {
      emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
        .write.format("noop").mode("overwrite").save()
    }
    // c: full fused pass (argmin + posexplode + decimal agg)
    time("fused pass (argmin+posexplode+decagg)") {
      emb.select(argmin(col("embedding")).as("centroid"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid"), col("d"))
        .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).cast("float").as("vr"))
        .collect()
    }
    // d: fused but double agg (non-deterministic order; timing only)
    time("fused pass, double agg") {
      emb.select(argmin(col("embedding")).as("centroid"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid"), col("d"))
        .agg((sum(col("v")) / count(lit(1))).cast("float").as("vr"))
        .collect()
    }
    // e: posexplode + decimal agg, no argmin
    time("posexplode+decagg, no argmin") {
      emb.select((col("vec_id") % k).as("centroid"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid"), col("d"))
        .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).cast("float").as("vr"))
        .collect()
    }
    def argminLeast(e: org.apache.spark.sql.Column) =
      least(cents.map { case (cid, v) =>
        struct((-cos(e, v)).as("nc"), lit(cid).as("centroid"))
      }: _*).getField("centroid")
    // g: withColumn barrier so argmin evaluates per INPUT row, not per
    // exploded row
    time("fused, withColumn barrier") {
      emb.withColumn("centroid", argmin(col("embedding")))
        .select(col("centroid"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid"), col("d"))
        .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).cast("float").as("vr"))
        .collect()
    }
    // h: least() instead of array_min(array())
    time("argminLeast projection only") {
      emb.select(argminLeast(col("embedding")).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // i: both fixes
    time("fused, barrier + least") {
      emb.withColumn("centroid", argminLeast(col("embedding")))
        .select(col("centroid"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("centroid"), col("d"))
        .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
          count(lit(1))).cast("float").as("vr"))
        .collect()
    }
    // f: argmin + per-dimension column aggs (no explode)
    time("argmin + per-dim column decagg") {
      emb.select(argmin(col("embedding")).as("centroid"), col("embedding"))
        .groupBy(col("centroid"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(d =>
            sum(element_at(col("embedding"), d + 1).cast(DecimalType(28, 12)))
              .as(s"s$d")): _*)
        .collect()
    }
    spark.stop()
  }
}

package graft.io

import graft.memory.{MemoryConfig, MemoryStore}
import graft.model._
import graft.task.{TaskConfig, TaskStore}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Snapshot persistence for the agent stores (SURVEY.md §2.1 S3–S5).
  * The reference writes JSON snapshots per store (memory.py:63-91,
  * task.py:406-421) with an asymmetric-filename bug that makes load a
  * no-op (quirk Q1); here save/load are symmetric by construction and
  * the format is partition-parallel parquet (JSON via `format("json")`
  * if interchange with the reference's files is needed).
  */
object StoreIO {

  def saveMemory(store: MemoryStore, dir: String): Unit = {
    store.records.write.mode(SaveMode.Overwrite).parquet(s"$dir/records")
    store.summaries.write.mode(SaveMode.Overwrite).parquet(s"$dir/summaries")
    store.topics.write.mode(SaveMode.Overwrite).parquet(s"$dir/topics")
    store.kv.write.mode(SaveMode.Overwrite).parquet(s"$dir/kv")
  }

  def loadMemory(spark: SparkSession, dir: String,
      config: MemoryConfig = MemoryConfig()): MemoryStore = {
    import spark.implicits._
    MemoryStore(
      spark.read.parquet(s"$dir/records").as[MemoryRecord],
      spark.read.parquet(s"$dir/summaries").as[Summary],
      spark.read.parquet(s"$dir/topics").as[Topic],
      spark.read.parquet(s"$dir/kv").as[KvEntry],
      config)
  }

  def saveTasks(store: TaskStore, dir: String): Unit = {
    store.tasks.write.mode(SaveMode.Overwrite).parquet(s"$dir/tasks")
    store.logs.write.mode(SaveMode.Overwrite).parquet(s"$dir/logs")
    store.files.write.mode(SaveMode.Overwrite).parquet(s"$dir/files")
  }

  def loadTasks(spark: SparkSession, dir: String,
      config: TaskConfig = TaskConfig()): TaskStore = {
    import spark.implicits._
    TaskStore(
      spark.read.parquet(s"$dir/tasks").as[TaskRow],
      spark.read.parquet(s"$dir/logs").as[TaskLog],
      spark.read.parquet(s"$dir/files").as[ExtractedFileRow],
      config)
  }

  /** S6 — config-directory scan (manager.py:121-161): every
    * `config.json` under `<baseDir>/<server>/` into one DataFrame with
    * the owning directory captured from the file path. */
  def scanConfigs(spark: SparkSession, baseDir: String) = {
    import org.apache.spark.sql.functions._
    spark.read
      .option("pathGlobFilter", "config.json")
      .option("recursiveFileLookup", "true")
      .json(baseDir)
      .withColumn("server",
        regexp_extract(input_file_name(), "([^/]+)/config\\.json$", 1))
  }
}

package graft

import java.nio.file.Files

/** The DSv2 connector must read the reference's native snapshot format
  * (memory.py:63-76 shape) directly via spark.read.format. */
class MemorySnapshotSourceSpec extends SparkSpec {

  private val snapshot =
    """{
      |  "records": [
      |    {"timestamp": "2025/08/01 10:00:00", "content": "first note"},
      |    {"timestamp": "2025/08/01 11:00:00", "content": "second note"}
      |  ],
      |  "summary": {
      |    "20250801_100500_000000": "early summary",
      |    "20250801_110500_000000": "later summary"
      |  },
      |  "topics": {
      |    "spark": {"description": "engine", "created": "20250801_100000_000000",
      |              "last_updated": "20250801_110000_000000", "frequency": 3},
      |    "ducks": {"description": "oracle", "created": "20250801_100100_000000",
      |              "last_updated": "20250801_100100_000000", "frequency": 1}
      |  },
      |  "database": {"goal": "ship engine", "fact_1": "42"}
      |}""".stripMargin

  private lazy val file = {
    val f = Files.createTempFile("memory-test", ".json")
    Files.writeString(f, snapshot)
    f.toString
  }

  test("reads records, summaries, topics, database sections") {
    val records = spark.read.format("memory-snapshot")
      .option("section", "records").load(file).collect()
    assert(records.map(_.getString(1)).toSeq == Seq("first note", "second note"))

    val summaries = spark.read.format("memory-snapshot")
      .option("section", "summaries").load(file).collect()
    // reference reads the latest as max(keys) — string order preserved
    assert(summaries.map(_.getString(0)).max == "20250801_110500_000000")

    val topics = spark.read.format("memory-snapshot")
      .option("section", "topics").load(file)
    val spark_t = topics.filter(topics("name") === "spark").collect().head
    assert(spark_t.getString(1) == "engine" && spark_t.getLong(4) == 3L)

    val kv = spark.read.format("memory-snapshot")
      .option("section", "database").load(file).collect()
    assert(kv.map(r => r.getString(0) -> r.getString(1)).toMap ==
      Map("goal" -> "ship engine", "fact_1" -> "42"))
  }

  test("reads task snapshots (task.py:406-421 shape) as tasks and task_logs") {
    val taskSnap =
      """{
        |  "1": {"target": "build x", "plan": "steps", "progress": "50%",
        |        "logs": [
        |          {"timestamp": "20250801_100000_000000", "query": "q1",
        |           "response_summary": "r1", "entries": [], "files": {},
        |           "metadata": {}, "error": null},
        |          {"timestamp": "20250801_110000_000000", "query": "q2",
        |           "response_summary": "r2", "entries": [], "files": {},
        |           "metadata": {}, "error": "boom"}
        |        ]},
        |  "2": {"target": "other", "plan": "", "progress": "", "logs": []}
        |}""".stripMargin
    val f = Files.createTempFile("task-test", ".json")
    Files.writeString(f, taskSnap)
    val tasks = spark.read.format("memory-snapshot")
      .option("section", "tasks").load(f.toString).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(tasks == Map(1L -> ("build x", 2L), 2L -> ("other", 0L)))
    val logs = spark.read.format("memory-snapshot")
      .option("section", "task_logs").load(f.toString).collect()
    assert(logs.length == 2)
    assert(logs.map(_.getString(2)).toSet == Set("q1", "q2"))
    assert(logs.find(_.getString(2) == "q2").get.getString(4) == "boom")
    assert(logs.find(_.getString(2) == "q1").get.isNullAt(4))
  }

  test("the source composes with SQL over a temp view") {
    spark.read.format("memory-snapshot").option("section", "topics").load(file)
      .createOrReplaceTempView("snap_topics")
    val top = spark.sql(
      "SELECT name FROM snap_topics ORDER BY frequency DESC LIMIT 1").collect()
    assert(top.head.getString(0) == "spark")
  }
}

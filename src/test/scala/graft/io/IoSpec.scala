package graft.io

import graft.SparkSpec
import java.nio.file.Files

class IoSpec extends SparkSpec {

  private def csvDir = {
    val dir = Files.createTempDirectory("graft-io")
    Files.writeString(dir.resolve("users.csv"),
      """user_id,user_name,user_age,user_country,created_at
        |1,Alice,30,US,2024-01-01
        |2,,25,FR,2024-01-02
        |""".stripMargin)
    dir
  }

  test("strict csv source applies declared schema and maps empty string to NULL") {
    val dir = csvDir
    val users = Sources.users(spark, dir.resolve("users.csv").toString)
    assert(users.schema("user_id").dataType.typeName == "integer")
    assert(users.schema("created_at").dataType.typeName == "date")
    val rows = users.collect().sortBy(_.getInt(0))
    assert(rows(1).isNullAt(1)) // empty user_name → NULL (BLANKSASNULL parity)
  }

  test("FAILFAST rejects malformed rows (COPY MAXERROR 0 parity)") {
    val dir = Files.createTempDirectory("graft-io-bad")
    Files.writeString(dir.resolve("users.csv"),
      """user_id,user_name,user_age,user_country,created_at
        |not_an_int,Bob,25,FR,2024-01-02
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      Sources.users(spark, dir.resolve("users.csv").toString).collect()
    }
  }

  test("renameColumns bridges source names to warehouse names") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("key", "mode")
    val out = Sources.renameColumns(df, "key" -> "song_key")
    assert(out.columns.toSeq == Seq("song_key", "mode"))
  }

  test("csv sink overwrites (full-refresh semantics) and round-trips nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").resolve("out").toString
    Sinks.csv(Seq((1, "x"), (2, null)).toDF("id", "v"), dir, singleFile = true)
    Sinks.csv(Seq((3, "y")).toDF("id", "v"), dir, singleFile = true) // overwrite
    val back = spark.read.option("header", "true").option("nullValue", "").csv(dir)
    assert(back.collect().map(_.getString(0)).toSeq == Seq("3"))
  }

  test("table sink drops + recreates via overwrite saveAsTable") {
    import spark.implicits._
    Sinks.table(Seq((1, "a")).toDF("id", "v"), "graft_test_tbl")
    Sinks.table(Seq((2, "b"), (3, "c")).toDF("id", "v"), "graft_test_tbl")
    assert(spark.table("graft_test_tbl").count() == 2)
    spark.sql("DROP TABLE graft_test_tbl")
  }

  test("serializeArray and PyRepr forms at the sink boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, Seq("a", "b"))).toDF("id", "arr")
    assert(Sinks.serializeArray(df, "arr").select("arr").as[String].head() == "a,b")
    assert(Sinks.serializeArrayPyRepr(df, "arr").select("arr").as[String].head() == "['a', 'b']")
  }
}

package graft.streaming

import graft.SparkSpec
import graft.io.Sources
import java.nio.file.Files

class JdbcUpsertSinkSpec extends SparkSpec {

  private val jdbcUrl = "jdbc:derby:memory:graftsinkdb;create=true"
  // Derby maps StringType to CLOB, which is neither comparable nor
  // groupable — declare VARCHAR at the staging boundary, as a production
  // load into any warehouse would
  private val colTypes =
    Map("createTableColumnTypes" -> "track_id VARCHAR(32)")

  private def tableMap(table: String): Map[Long, String] =
    Sources.jdbc(spark, jdbcUrl, table).collect()
      .map(r => r.getAs[Number]("user_id").longValue() ->
        r.getAs[String]("track_id")).toMap

  test("streaming staged merge upserts a warehouse table, last writer wins per key") {
    val dir = Files.createTempDirectory("graft-jsink")
    val inDir = dir.resolve("in"); Files.createDirectories(inDir)
    def shard(name: String, rows: String): Unit =
      Files.writeString(inDir.resolve(name),
        "user_id,track_id,listen_time\n" + rows)
    shard("a.csv",
      """1,tA,2024-06-25T10:00:00.000Z
        |2,tB,2024-06-25T10:10:00.000Z
        |""".stripMargin)
    // user 1 twice in one batch (latest = tD) and across batches
    shard("b.csv",
      """1,tC,2024-06-25T11:00:00.000Z
        |1,tD,2024-06-25T11:30:00.000Z
        |3,tE,2024-06-25T11:40:00.000Z
        |""".stripMargin)
    java.nio.file.Files.setLastModifiedTime(inDir.resolve("a.csv"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(inDir.resolve("b.csv"),
      java.nio.file.attribute.FileTime.fromMillis(1000000060000L))
    val stream = StreamingKpis.fileStream(spark, Sources.streamsSchema,
      inDir.toString, maxFilesPerTrigger = 1)
    JdbcUpsertSink.sink(stream, Seq("user_id"), "listen_time",
        jdbcUrl, "wh_users", dir.resolve("ckpt").toString, options = colTypes)
      .start().awaitTermination(60000)
    assert(tableMap("wh_users") == Map(1L -> "tD", 2L -> "tB", 3L -> "tE"))
    // lineage recorded the last applied batch under this checkpoint's tag
    val (tag, lastId) = JdbcUpsertSink.lastApplied(jdbcUrl, "wh_users")
    assert(tag == dir.resolve("ckpt").toString && lastId == 1L)
  }

  test("replaying an applied batch id is a no-op; a new batch id applies") {
    import spark.implicits._
    val table = "wh_replay"
    val b0 = Seq((1L, "x", 10L), (2L, "y", 10L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "x", 2L -> "y"))
    // a restarted stream re-delivers batch 0 with (legally) the same
    // content — but even a DIFFERENT payload must be skipped: the lineage
    // row says batch 0 is already applied
    val b0replay = Seq((1L, "CORRUPT", 99L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0replay, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "x", 2L -> "y"), "replayed batch must not re-apply")
    // the next batch id applies: updates user 1, inserts user 3
    val b1 = Seq((1L, "z", 20L), (3L, "w", 20L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b1, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 1L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "z", 2L -> "y", 3L -> "w"))
    // a NEW checkpoint lineage (fresh tag) starts over and applies batch 0
    val b0new = Seq((2L, "fresh", 30L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0new, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck2", batchId = 0L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "z", 2L -> "fresh", 3L -> "w"))
  }

  test("apply and lineage bump commit atomically: a failed apply leaves neither") {
    import spark.implicits._
    val table = "wh_atomic"
    val b0 = Seq((1L, "a", 1L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    // batch 1 with a schema the staged DELETE/INSERT cannot apply (column
    // set drift) — the transaction must roll back: target rows AND the
    // lineage row stay at batch 0, so a corrected retry of batch 1 works
    val bad = Seq((1L, 5L)).toDF("user_id", "seq")
    intercept[Exception] {
      JdbcUpsertSink.upsertBatch(bad, Seq("user_id"), "seq", jdbcUrl, table,
        checkpointTag = "ck", batchId = 1L)
    }
    assert(tableMap(table) == Map(1L -> "a"))
    assert(JdbcUpsertSink.lastApplied(jdbcUrl, table) == ("ck", 0L))
    val fixed = Seq((1L, "b", 2L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(fixed, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 1L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "b"))
    assert(JdbcUpsertSink.lastApplied(jdbcUrl, table) == ("ck", 1L))
  }

  test("guards: orderCol in keys and a reserved __rn column are rejected loudly") {
    import spark.implicits._
    val b = Seq((1L, "a", 1L)).toDF("user_id", "track_id", "seq")
    val e1 = intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertBatch(b, Seq("user_id", "seq"), "seq", jdbcUrl,
        "wh_guard", checkpointTag = "ck", batchId = 0L)
    }
    assert(e1.getMessage.contains("orderCol"))
    val b2 = b.withColumn("__rn", org.apache.spark.sql.functions.lit(1))
    val e2 = intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertBatch(b2, Seq("user_id"), "seq", jdbcUrl,
        "wh_guard", checkpointTag = "ck", batchId = 0L)
    }
    assert(e2.getMessage.contains("__rn"))
  }

  test("no shared stage table lingers after an applied batch (per-attempt staging)") {
    import spark.implicits._
    val table = "wh_stagedrop"
    val b0 = Seq((1L, "a", 1L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    // the apply transaction must have dropped its private stage: the only
    // tables carrying this prefix are the target and its lineage
    val conn = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      val rs = conn.getMetaData.getTables(null, null, "WH_STAGEDROP%", null)
      val names = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME")).toList
      rs.close()
      assert(names.map(_.toLowerCase).toSet ==
        Set("wh_stagedrop", "wh_stagedrop_lineage"), s"found $names")
    } finally conn.close()
  }

  test("a successful apply sweeps staging orphans from crashed earlier attempts") {
    import spark.implicits._
    val table = "wh_orphan"
    val conn = java.sql.DriverManager.getConnection(jdbcUrl)
    def tables(): Set[String] = {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      val names = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME").toLowerCase)
        .filter(_.startsWith(table)).toSet
      rs.close(); names
    }
    try {
      val st = conn.createStatement()
      // orphans a dead driver would leave: staged rows for batches 0 and 1,
      // never applied (no lineage row points past them)
      st.executeUpdate(s"CREATE TABLE ${table}_s0_deadbeef0001 (user_id BIGINT)")
      st.executeUpdate(s"CREATE TABLE ${table}_s1_deadbeef0002 (user_id BIGINT)")
      // a FUTURE batch's stage (id 99) and an unrelated sibling table must
      // both survive the sweep
      st.executeUpdate(s"CREATE TABLE ${table}_s99_deadbeef0003 (user_id BIGINT)")
      st.executeUpdate(s"CREATE TABLE ${table}_summary (user_id BIGINT)")
      st.close()
      val b1 = Seq((1L, "a", 1L)).toDF("user_id", "track_id", "seq")
      JdbcUpsertSink.upsertBatch(b1, Seq("user_id"), "seq", jdbcUrl, table,
        checkpointTag = "ck", batchId = 1L, options = colTypes)
      // the sweep is strictly below the applied id: the CURRENT batch's
      // own-id orphan might be a racing replacement attempt mid-flight, so
      // it survives until the NEXT batch's sweep collects it
      assert(tables() == Set(table, s"${table}_lineage",
        s"${table}_s1_deadbeef0002",
        s"${table}_s99_deadbeef0003", s"${table}_summary"),
        "orphans strictly below the applied batch id must be dropped; the " +
          "current id's stage, future stages and non-stage siblings survive")
      val b2 = Seq((1L, "b", 2L)).toDF("user_id", "track_id", "seq")
      JdbcUpsertSink.upsertBatch(b2, Seq("user_id"), "seq", jdbcUrl, table,
        checkpointTag = "ck", batchId = 2L, options = colTypes)
      assert(tables() == Set(table, s"${table}_lineage",
        s"${table}_s99_deadbeef0003", s"${table}_summary"),
        "the next batch's sweep collects the previous id's orphan")
    } finally conn.close()
  }

  test("crash between staging write and apply: the redelivered batch applies exactly once") {
    import spark.implicits._
    val table = "wh_crash"
    // simulate a driver that died AFTER the parallel staging write but
    // BEFORE its apply transaction: the private stage exists, no target,
    // no lineage. Structured Streaming then redelivers the same batch id
    // from the checkpoint on restart.
    val dead = Seq((1L, "a", 1L)).toDF("user_id", "track_id", "seq")
    colTypes.foldLeft(
        dead.write.format("jdbc").option("url", jdbcUrl)
          .option("dbtable", s"${table}_s0_deadattempt1")
      ) { case (w, (k, v)) => w.option(k, v) }
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    assert(JdbcUpsertSink.lastApplied(jdbcUrl, table) == ("", -1L),
      "the dead attempt must not have applied anything")
    // the restarted stream re-runs batch 0 (fresh private stage, applies)
    val b0 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b0, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "a", 2L -> "b"))
    assert(JdbcUpsertSink.lastApplied(jdbcUrl, table) == ("ck", 0L))
    // a second redelivery of batch 0 (zombie retry) is a pure no-op — no
    // duplicate rows, no double-apply
    JdbcUpsertSink.upsertBatch(b0, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 0L, options = colTypes)
    assert(Sources.jdbc(spark, jdbcUrl, table).count() == 2L,
      "replay must not duplicate rows")
    // batch 1 applies and its sweep collects the dead attempt's orphan
    val b1 = Seq((1L, "z", 2L)).toDF("user_id", "track_id", "seq")
    JdbcUpsertSink.upsertBatch(b1, Seq("user_id"), "seq", jdbcUrl, table,
      checkpointTag = "ck", batchId = 1L, options = colTypes)
    assert(tableMap(table) == Map(1L -> "z", 2L -> "b"))
    val conn = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      val names = Iterator.continually(rs).takeWhile(_.next())
        .map(_.getString("TABLE_NAME").toLowerCase)
        .filter(_.startsWith(table)).toSet
      rs.close()
      assert(names == Set(table, s"${table}_lineage"),
        s"dead attempt's stage must be swept, found $names")
    } finally conn.close()
  }
}

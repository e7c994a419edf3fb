package graft.streaming

import graft.SparkSpec

class RunningProfileSpec extends SparkSpec {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState requires the RocksDB provider; set it for the
    * query and restore whatever the shared session had (other suites run
    * against the default HDFS-backed provider). */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("runningProfile: per-user totals, type map and mode across micro-batches " +
      "(update mode: only touched keys emit)") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String, Double)]
      val df = input.toDF.toDF("user_id", "event_type", "value")
      val out = RunningProfile.runningProfile(spark, df,
        "user_id", "event_type", "value")
      val q = out.writeStream.format("memory").queryName("tws_profile")
        .outputMode("update").start()
      try {
        input.addData((1L, "view", 1.0), (1L, "view", 2.0), (2L, "purchase", 10.0))
        q.processAllAvailable()
        val b1 = spark.table("tws_profile").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
          .toMap
        assert(b1(1L) == ((2L, 300L, 1L, "view")))
        assert(b1(2L) == ((1L, 1000L, 1L, "purchase")))

        // batch 2 touches only user 1; user 2 must NOT re-emit (update mode)
        input.addData((1L, "purchase", 5.0), (1L, "purchase", 6.0))
        q.processAllAvailable()
        val emitted = spark.table("tws_profile").collect()
        assert(emitted.length == 3, "update mode: one new row, for user 1 only")
        val u1 = emitted.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).filter(_._1 == 1L).maxBy(_._2)
        // 4 events, 1400 cents, 2 types, mode = purchase (2) vs view (2):
        // tie broken to the lexicographically smaller type — the GroupTop
        // (count DESC, value ASC) order
        assert(u1 == ((1L, 4L, 1400L, 2L, "purchase")))
      } finally q.stop()
    }
  }

  test("runningProfile drops null keys/types and zero-fills null values") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(java.lang.Long, String, java.lang.Double)]
      val df = input.toDF.toDF("user_id", "event_type", "value")
      val out = RunningProfile.runningProfile(spark, df,
        "user_id", "event_type", "value")
      val q = out.writeStream.format("memory").queryName("tws_profile_nulls")
        .outputMode("update").start()
      try {
        input.addData(
          (java.lang.Long.valueOf(7L), "view", java.lang.Double.valueOf(1.5)),
          (java.lang.Long.valueOf(7L), "view", null), // null value → 0 cents
          (null, "view", java.lang.Double.valueOf(9.9)), // null key → dropped
          (java.lang.Long.valueOf(7L), null, java.lang.Double.valueOf(2.0))) // null type → dropped
        q.processAllAvailable()
        val rows = spark.table("tws_profile_nulls").collect()
        assert(rows.length == 1)
        val r = rows.head
        assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)) == ((7L, 2L, 150L, 1L, "view")))
      } finally q.stop()
    }
  }

  test("idleFinalizedTotals emits one final row per idle episode, only once " +
      "the watermark proves the key idle (event-time timers)") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def t(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val df = input.toDF.toDF("user_id", "ts", "value")
      val out = RunningProfile.idleFinalizedTotals(spark, df,
        "user_id", "ts", "value", gapMs = 10 * 60000L, lateness = "5 minutes")
      val q = out.writeStream.format("memory").queryName("tws_idle")
        .outputMode("append").start()
      try {
        input.addData((1L, t(0), 1.0), (1L, t(5), 2.0))
        q.processAllAvailable()
        assert(spark.table("tws_idle").isEmpty,
          "nothing finalizes while the watermark is behind the idle deadline")
        // watermark advance: t(40) - 5 min lateness = t(35) > t(5) + 10 min
        // gap → user 1's timer fires (watermark updates lag one batch)
        input.addData((2L, t(40), 7.0))
        q.processAllAvailable()
        input.addData((2L, t(41), 0.25))
        q.processAllAvailable()
        val rows = spark.table("tws_idle").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(rows.toSeq == Seq((1L, 2L, 300L)),
          s"exactly user 1's episode finalizes, got ${rows.toSeq}")
        // user 1 returns: a NEW accumulation — finalized independently
        input.addData((1L, t(50), 4.0))
        q.processAllAvailable()
        input.addData((2L, t(80), 0.0)) // push watermark past t(50)+gap
        q.processAllAvailable()
        input.addData((2L, t(81), 0.0))
        q.processAllAvailable()
        val again = spark.table("tws_idle").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .filter(_._1 == 1L)
        assert(again.toSeq == Seq((1L, 2L, 300L), (1L, 1L, 400L)),
          s"the return visit finalizes as its own episode, got ${again.toSeq}")
      } finally q.stop()
    }
  }

  test("recentEvents keeps the last K types newest-first across batches " +
      "(ListState trim)") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def t(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val df = input.toDF.toDF("user_id", "ts", "event_type")
      val out = RunningProfile.recentEvents(spark, df,
        "user_id", "ts", "event_type", k = 3)
      val q = out.writeStream.format("memory").queryName("tws_recent")
        .outputMode("update").start()
      try {
        input.addData((1L, t(0), "a"), (1L, t(1), "b"))
        q.processAllAvailable()
        // batch 2 arrives with an OLDER event than batch 1's newest: it
        // must sort into place, not append blindly
        input.addData((1L, t(3), "d"), (1L, t(2), "c"), (2L, t(5), "x"))
        q.processAllAvailable()
        val latest = spark.table("tws_recent").collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toList)
          .groupBy(_._1).map { case (u, rs) => u -> rs.last._2 }
        // user 1 saw a,b,c,d → trimmed to last 3 by ts, newest first
        assert(latest(1L) == List("d", "c", "b"))
        assert(latest(2L) == List("x"))
      } finally q.stop()
    }
  }

  test("runningProfile final state is batch-split independent and matches a " +
      "plain batch aggregation") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val all = Seq(
        (1L, "view", 1.0), (1L, "click", 2.0), (1L, "click", 3.0),
        (2L, "view", 4.0), (2L, "view", 0.5), (3L, "purchase", 7.25))

      def runSplit(splits: Seq[Seq[(Long, String, Double)]], name: String) = {
        val input = MemoryStream[(Long, String, Double)]
        val out = RunningProfile.runningProfile(spark,
          input.toDF.toDF("user_id", "event_type", "value"),
          "user_id", "event_type", "value")
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try {
          splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
          // latest emission per user = final state
          spark.table(name).collect()
            .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
            .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
        } finally q.stop()
      }

      val oneShot = runSplit(Seq(all), "tws_split_a")
      val threeBatches = runSplit(all.grouped(2).toSeq, "tws_split_b")
      assert(oneShot == threeBatches)
      // cross-check vs a plain batch aggregation of the same rows
      assert(oneShot(1L) == ((3L, 600L, 2L, "click")))
      assert(oneShot(2L) == ((2L, 450L, 1L, "view")))
      assert(oneShot(3L) == ((1L, 725L, 1L, "purchase")))
    }
  }

  test("runningProfile recovers ValueState+MapState from a checkpoint: stop " +
      "after batch 1, restart, final profiles equal the uninterrupted run") {
    withRocksDb {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tws-recover").toString
      // foreachBatch, not the memory sink: the memory sink refuses
      // checkpoint recovery outside Complete mode, and recovery is the
      // thing under test
      val got = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long, Long, String)]()
      val input = MemoryStream[(Long, String, Double)]
      val out = RunningProfile.runningProfile(spark,
        input.toDF.toDF("user_id", "event_type", "value"),
        "user_id", "event_type", "value")
      def start() = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add((r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getString(4))))
          ()
        }.start()
      val q1 = start()
      try {
        input.addData((1L, "view", 1.0), (1L, "view", 2.0), (2L, "purchase", 10.0))
        q1.processAllAvailable()
      } finally q1.stop()
      // kill point: totals and the per-type map now live ONLY in the
      // RocksDB checkpoint; data arriving while down is delivered on
      // restart from the recorded source offsets
      input.addData((1L, "purchase", 5.0), (2L, "view", 0.5), (2L, "view", 0.5))
      val q2 = start()
      try q2.processAllAvailable()
      finally q2.stop()
      val finalByUser = got.asScala.toSeq.groupBy(_._1)
        .map { case (u, rows) => u -> rows.last }
      // exactly the uninterrupted fold of all 6 events (the operator's
      // batch-split-independence spec above makes the hand-computed fold
      // THE uninterrupted run's answer): state from before the stop must
      // still be inside the totals — not just batch 2's deltas
      assert(finalByUser(1L) == ((1L, 3L, 800L, 2L, "view")),
        s"user 1 must carry pre-restart state, got ${finalByUser(1L)}")
      assert(finalByUser(2L) == ((2L, 3L, 1100L, 2L, "view")),
        s"user 2 must carry pre-restart state, got ${finalByUser(2L)}")
    }
  }

  test("idleFinalizedTotals recovers event-time timers and the watermark " +
      "from a checkpoint: an episode accumulated before the stop finalizes " +
      "after the restart") {
    withRocksDb {
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def t(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tws-timer-recover").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
      val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val out = RunningProfile.idleFinalizedTotals(spark,
        input.toDF.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", gapMs = 10 * 60000L, lateness = "5 minutes")
      def start() = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getLong(2))))
          ()
        }.start()
      val q1 = start()
      try {
        input.addData((1L, t(0), 1.0), (1L, t(5), 2.0))
        q1.processAllAvailable()
        assert(got.isEmpty,
          "nothing finalizes while the watermark is behind the idle deadline")
      } finally q1.stop()
      // kill point: user 1's accumulator, its registered timer AND the
      // watermark position all live only in the checkpoint now
      val q2 = start()
      try {
        // watermark advance: t(40) − 5 min lateness = t(35) > t(5) + 10 min
        // gap → the RECOVERED timer fires (watermark updates lag one batch)
        input.addData((2L, t(40), 7.0))
        q2.processAllAvailable()
        input.addData((2L, t(41), 0.25))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(got.asScala.toSeq == Seq((1L, 2L, 300L)),
        "the pre-stop episode must finalize exactly once after recovery, " +
          s"got ${got.asScala.toSeq}")
    }
  }
}

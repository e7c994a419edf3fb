package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** The streaming face of [[SnapshotConcurrencySpec]]'s stress canary: a
  * maintenance compactor races live micro-batch overlay appliers for
  * 12 triggers. The compactor folds overlays as soon as ONE is pending
  * (maxOverlays = 0) from a 5 ms polling loop, so nearly every trigger's
  * stageDelta commits against a table the compactor is concurrently
  * rewriting — the production shape of a scheduled OPTIMIZE job running
  * under a live CDC stream. Invariants:
  *
  *   - NO BATCH LOST: every batch carries a witness key only it writes;
  *     all 12 witnesses must survive to the final table, and shared keys
  *     must hold the LAST batch's value (a dropped stageDelta, or a
  *     compact that swept an unfolded overlay, loses one).
  *   - NO DOUBLE-APPLY DAMAGE: re-delivering the final batch (what a
  *     restarted stream does after a crash between apply and checkpoint
  *     commit) leaves the content invariant — either the lineage marker
  *     skips it, or (marker overwritten by a compact) it re-applies
  *     content-idempotently, the documented degradation.
  *   - the compactor itself never surfaces an error through its
  *     retryOnConflict loop. */
class StreamingMaintenanceRaceSpec extends SparkSpec {

  test("compactor races 12 streaming overlay micro-batches: no batch lost, no double-apply damage") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-stream-race")
    val base = tmp.resolve("snap").toString
    val ckpt = tmp.resolve("ckpt").toString
    val nBatches = 12
    val sharedKeys = 0L until 20L

    val stop = new AtomicBoolean(false)
    val folds = new AtomicInteger(0)
    val compErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val compactor = new Thread(() => {
      while (!stop.get) {
        try {
          val r = VersionedSnapshot.retryOnConflict(attempts = 10) {
            VersionedSnapshot.maintain(spark, base, Seq("k"),
              marker = "race-compact", maxOverlays = 0)
          }
          if (r.isDefined) folds.incrementAndGet()
          ()
        } catch { case e: Throwable => compErrs.add(e); () }
        Thread.sleep(5L)
      }
    }, "graft-race-compactor")
    compactor.start()

    val input = MemoryStream[(Long, Long, Long)]
    def sink() = VersionedSnapshot.deltaSink(
      input.toDF.toDF("k", "v", "ord"), Seq("k"), "ord", base, ckpt,
      numBuckets = 4,
      maxOverlays = Int.MaxValue) // internal self-maintenance OFF: the racing compactor is the only folder
    try {
      (0 until nBatches).foreach { b =>
        input.addData(
          sharedKeys.map(k => (k, 1000L + b, b.toLong)) :+
            (1000L + b, 500L + b, b.toLong))
        sink().start().awaitTermination(120000L)
      }
    } finally {
      stop.set(true)
      compactor.join(30000L)
    }
    assert(compErrs.isEmpty,
      s"compactor surfaced ${compErrs.size} error(s): ${compErrs.peek()}")
    assert(folds.get >= 1,
      "the compactor never folded an overlay — the race did not happen")

    def tableNow(): Map[Long, Long] =
      VersionedSnapshot.read(spark, base).get.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected =
      sharedKeys.map(k => k -> (1000L + nBatches - 1)).toMap ++
        (0 until nBatches).map(b => (1000L + b) -> (500L + b)).toMap
    val got = tableNow()
    assert(got == expected, {
      val missing = expected.keySet -- got.keySet
      val wrong = expected.keySet.intersect(got.keySet)
        .filter(k => got(k) != expected(k))
      s"lost/garbled batches — missing keys $missing, wrong values " +
        wrong.map(k => s"$k: got ${got(k)} want ${expected(k)}").mkString(", ")
    })

    // crash-restart shape: the stream re-delivers its FINAL batch (same
    // batch id, same content) — apply the batch layer directly, as
    // foreachBatch would on restart, and require content invariance
    val lastB = nBatches - 1
    val redelivery =
      (sharedKeys.map(k => (k, 1000L + lastB, lastB.toLong)) :+
        (1000L + lastB, 500L + lastB, lastB.toLong)).toDF("k", "v", "ord")
    VersionedSnapshot.stageDeltaBatch(redelivery, Seq("k"), "ord", base,
      checkpointTag = ckpt, batchId = lastB.toLong, numBuckets = 4)
    assert(tableNow() == expected,
      "re-delivered final batch changed content — double-apply damage")
  }
}

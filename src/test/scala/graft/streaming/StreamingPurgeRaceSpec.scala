package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** GDPR erasure under live ingest: a purge races streaming overlay
  * appliers and their inline maintenance folds. The resurrection channel
  * here is the FOLD, not the overlay — overlays carry source rows only,
  * but a maintenance compact stages its output from pre-purge bucket
  * files, so a fold that straddles the purge would republish the erased
  * subject. The purge's linearization commit makes the straddling fold
  * lose its CAS and retry against purged manifests, same as any writer.
  *
  * Shape: batches 0..3 upsert the subject among their keys; the purge
  * then races batches 4..7 (subject-free) live. Afterwards the subject
  * must be gone from the CURRENT table and from EVERY retained version,
  * while every witness and shared key holds its last-batch value —
  * whatever interleave the race actually took. */
class StreamingPurgeRaceSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("purge races live streaming batches + folds: erasure holds, no batch lost") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-spurge")
    val base = tmp.resolve("snap").toString
    val ckpt = tmp.resolve("ckpt").toString
    val subject = 7L
    val sharedKeys = 0L until 10L
    val nBatches = 8

    val input = MemoryStream[(Long, Long, Long)]
    def sink() = VersionedSnapshot.deltaSink(
      input.toDF.toDF("k", "v", "ord"), Seq("k"), "ord", base, ckpt,
      retain = 30, numBuckets = 4,
      maxOverlays = 1) // fold eagerly: every other trigger compacts inline

    def runBatch(b: Int): Unit = {
      val keys = if (b <= 3) sharedKeys else sharedKeys.filterNot(_ == subject)
      input.addData(keys.map(k => (k, 1000L + b, b.toLong)) :+
        (100L + b, 500L + b, b.toLong))
      sink().start().awaitTermination(120000L)
      ()
    }

    (0 until 4).foreach(runBatch)
    // sanity: the subject is live in the table before the purge
    assert(VersionedSnapshot.read(spark, base).get
      .filter(col("k") === subject).count() == 1)

    val purgeErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val purger = new Thread(() => {
      try {
        // the linearization loop bounds each call; under a pathological
        // commit storm it surfaces loudly — retry the whole call, as an
        // operator would, rather than widening the internal bound
        var attempts = 3
        var done = false
        while (!done) {
          attempts -= 1
          try {
            VersionedSnapshot.purgeKeys(spark, base, Seq("k"),
              Seq(Seq(subject)), marker = "gdpr-purge")
            done = true
          } catch {
            case _: IllegalStateException if attempts > 0 => Thread.sleep(100L)
            case e: Throwable => throw e
          }
        }
      } catch { case e: Throwable => purgeErrs.add(e); () }
    }, "graft-spurge-purger")
    purger.start()
    (4 until nBatches).foreach(runBatch)
    purger.join(180000L)
    assert(!purger.isAlive, "purger wedged against the live stream")
    assert(purgeErrs.isEmpty,
      s"purge failed under live ingest: ${purgeErrs.peek()}")

    // erasure holds everywhere: current AND every retained version
    val cur = VersionedSnapshot.read(spark, base).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!cur.contains(subject), s"subject resurrected into current: $cur")
    val curV = VersionedSnapshot.currentVersion(spark, base).get
    (0L to curV).foreach { v =>
      VersionedSnapshot.readVersion(spark, base, v).foreach { df =>
        assert(df.filter(col("k") === subject).count() == 0,
          s"purged subject survives in retained v$v")
      }
    }
    // and the stream lost nothing else: shared keys hold the LAST batch's
    // value, every witness row survives
    sharedKeys.filterNot(_ == subject).foreach { k =>
      assert(cur.get(k).contains(1000L + nBatches - 1),
        s"shared key $k lost the last batch: ${cur.get(k)}")
    }
    (0 until nBatches).foreach { b =>
      assert(cur.get(100L + b).contains(500L + b), s"witness of batch $b lost")
    }
    // on a STREAMING table the purge commit preserves the lineage marker
    // verbatim (replay-skip survival beats marker cosmetics — an
    // overwritten lineage marker would re-apply the last batch on
    // restart, potentially resurrecting the subject); purge identity is
    // the _PURGED sidecar
    val versions = VersionedSnapshot.history(spark, base)
      .select("version").collect().map(_.getLong(0))
    assert(versions.exists(v =>
      VersionedSnapshot.purgedKeys(spark, base, v).isDefined),
      "no retained version carries the purge retraction sidecar")
    // and the retraction names exactly the subject
    val retracted = versions.flatMap(v =>
      VersionedSnapshot.purgedKeys(spark, base, v)).flatMap(
      _.collect().map(_.getLong(0)))
    assert(retracted.toSet == Set(subject),
      s"retraction subjects wrong: ${retracted.toSeq}")
    // lineage survived the purge commit: the LAST batch is still the
    // recorded replay horizon, so a restart cannot re-apply batch data
    // over the erasure
    val (tag, lastId) = VersionedSnapshot.lastApplied(spark, base)
    assert(tag == ckpt && lastId == nBatches - 1,
      s"streaming lineage lost across the purge commit: ($tag, $lastId)")
  }
}

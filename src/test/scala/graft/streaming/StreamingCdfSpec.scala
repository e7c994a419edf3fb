package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** r15 streaming CDF source contract ([[VersionedSnapshot.changesStream]]):
  * a snapshot table's version history consumed as micro-batches with a
  * durable offset — the `readChangeFeed`-streaming analog and the
  * read-side twin of mergeSink/deltaSink. Pins: one micro-batch per
  * version with purge retractions folded in; offset durability across
  * drains and restarts; the at-least-once redelivery window (crash
  * between handler and offset advance) healing under an idempotent
  * handler; the loud resync signal when the range falls past retention;
  * and the bootstrap-at-current default. */
class StreamingCdfSpec extends SparkSpec {
  import spark.implicits._

  private def seedTable(base: String): Long =
    mergeInto(base, (1L to 20L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed", retain = 10,
      numBuckets = 4)

  test("one micro-batch per version; upserts, deletes and purge " +
      "retractions arrive in order; a second drain delivers nothing") {
    val base = Files.createTempDirectory("graft-cdfs1").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs1-ck").toString
    val v0 = seedTable(base)
    mergeInto(base, Seq((2L, 200L), (21L, 21L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "up", retain = 10)
    mergeInto(base, Seq((3L, 0L)).toDF("k", "v"), Seq("k"),
      DeleteMatched, insertUnmatched = false, marker = "del", retain = 10)
    assert(purgeKeys(spark, base, Seq("k"), Seq(Seq(5L))) > 0)

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Set[(String, Long)])]
    val n = changesStream(spark, base, Seq("k"), ckpt, startVersion = Some(v0)) {
      (feed, from, to) =>
        batches += ((from, to, feed.select("op", "k").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet))
    }
    assert(n == 3, s"one micro-batch per version, got $n")
    assert(batches.map(b => (b._1, b._2)) ==
      Seq((v0, v0 + 1), (v0 + 1, v0 + 2), (v0 + 2, v0 + 3)))
    assert(batches(0)._3 == Set(("update", 2L), ("insert", 21L)))
    assert(batches(1)._3 == Set(("delete", 3L)))
    assert(batches(2)._3 == Set(("purge", 5L)),
      s"the erasure retraction must reach the stream, got ${batches(2)._3}")
    // durable offset: a fresh drain from the same checkpoint is empty
    assert(changesStream(spark, base, Seq("k"), ckpt) { (_, _, _) =>
      sys.error("re-delivered")
    } == 0L)
    // ...and new versions resume from where the stream left off
    mergeInto(base, Seq((7L, 700L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up2", retain = 10)
    val more = scala.collection.mutable.ArrayBuffer.empty[Set[(String, Long)]]
    assert(changesStream(spark, base, Seq("k"), ckpt) { (feed, _, _) =>
      more += feed.select("op", "k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    } == 1L)
    assert(more.head == Set(("update", 7L)))
  }

  test("a crash between the handler and the offset advance re-delivers " +
      "exactly that batch on restart — at-least-once, effectively-once " +
      "under an idempotent handler") {
    val base = Files.createTempDirectory("graft-cdfs2").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs2-ck").toString
    val v0 = seedTable(base)
    mergeInto(base, Seq((1L, 100L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "u1", retain = 10)
    mergeInto(base, Seq((2L, 200L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "u2", retain = 10)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val boom = intercept[RuntimeException] {
      changesStream(spark, base, Seq("k"), ckpt, startVersion = Some(v0)) {
        (_, _, to) =>
          seen += to
          if (to == v0 + 2) sys.error("crash after side effect, before offset")
      }
    }
    assert(boom.getMessage.contains("crash after"))
    assert(seen == Seq(v0 + 1, v0 + 2))
    // restart: batch 1's offset advance survived, batch 2 re-delivers
    val replay = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(changesStream(spark, base, Seq("k"), ckpt) { (_, _, to) =>
      replay += to
    } == 1L)
    assert(replay == Seq(v0 + 2),
      s"exactly the un-acked batch must re-deliver, got $replay")
  }

  test("a range that fell past the retention horizon raises the loud " +
      "resync signal — never a silently purge-less feed") {
    val base = Files.createTempDirectory("graft-cdfs3").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs3-ck").toString
    val v0 = seedTable(base)
    // pin the offset at v0 with an empty drain
    assert(changesStream(spark, base, Seq("k"), ckpt,
      startVersion = Some(v0)) { (_, _, _) => () } == 0L)
    // retention retires v0 while the consumer lags
    (1 to 3).foreach { i =>
      mergeInto(base, Seq((i.toLong, i * 100L)).toDF("k", "v"), Seq("k"),
        UpdateMatched, insertUnmatched = false, marker = s"u$i", retain = 2)
    }
    val e = intercept[IllegalStateException] {
      changesStream(spark, base, Seq("k"), ckpt) { (_, _, _) => () }
    }
    assert(e.getMessage.contains("resync"),
      s"the consumer must get an explicit resync signal, got: ${e.getMessage}")
  }

  test("bootstrap default: with no offset and no startVersion the stream " +
      "starts at current — history before the bootstrap never replays") {
    val base = Files.createTempDirectory("graft-cdfs4").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs4-ck").toString
    seedTable(base)
    mergeInto(base, Seq((1L, 100L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "pre", retain = 10)
    assert(changesStream(spark, base, Seq("k"), ckpt) { (_, _, _) =>
      sys.error("pre-bootstrap history must not replay")
    } == 0L)
    mergeInto(base, Seq((2L, 200L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "post", retain = 10)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    assert(changesStream(spark, base, Seq("k"), ckpt) { (feed, _, _) =>
      seen += feed.select("k").collect().map(_.getLong(0)).toSet
    } == 1L)
    assert(seen == Seq(Set(2L)))
  }

  test("a predicated stream (ranges) delivers only in-range diff rows — " +
      "but purge retractions ALWAYS flow, filtered marts included") {
    val base = Files.createTempDirectory("graft-cdfs6").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs6-ck").toString
    seedTable(base) // v = k for k in 1..20
    // pre-stream: k=5 already sits OUTSIDE the consumer's range
    mergeInto(base, Seq((5L, 5000L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "pre", retain = 10)
    val v0 = currentVersion(spark, base).get
    // streamed window: one in-range update; one whose OLD value (3, in
    // range) leaves the range — the RETRACTION shape a filtered mart
    // needs; one invisible to the range on both sides (k=5); one purge
    mergeInto(base,
      Seq((2L, 50L), (3L, 5000L), (5L, 6000L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    assert(purgeKeys(spark, base, Seq("k"), Seq(Seq(9L))) > 0)
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(String, Long)]]
    val n = changesStream(spark, base, Seq("k"), ckpt,
        startVersion = Some(v0),
        ranges = Map("v" -> (Some(1L), Some(100L)))) { (feed, _, _) =>
      got += feed.select("op", "k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(n == 2L)
    // k=2 in-range; k=3 flows BECAUSE its old side was in range (the
    // mart must drop it); k=5 — out of range on both sides — must not
    assert(got(0) == Set(("update", 2L), ("update", 3L)),
      s"old-OR-new in range flows, both-sides-out does not; got ${got(0)}")
    assert(got(1) == Set(("purge", 9L)),
      s"the retraction must flow regardless of any range, got ${got(1)}")
  }

  test("concurrent drains on one checkpoint serialize through the drain " +
      "lock — a batch is never delivered twice in parallel") {
    val base = Files.createTempDirectory("graft-cdfs7").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs7-ck").toString
    val v0 = seedTable(base)
    mergeInto(base, Seq((1L, 100L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "u1", retain = 10)
    val delivered = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val drains = (1 to 2).map { i =>
      val t = new Thread(() => {
        try changesStream(spark, base, Seq("k"), ckpt,
            startVersion = Some(v0)) { (_, _, _) =>
          delivered.incrementAndGet()
          Thread.sleep(400) // hold the drain so the sibling provably waits
        }
        catch { case e: Throwable => errs.add(e); () }
      }, s"graft-cdf-drain-$i")
      t.start(); t
    }
    drains.foreach(_.join(120000))
    assert(errs.isEmpty, s"both drains must complete: ${errs.peek}")
    assert(delivered.get == 1,
      s"the single new version must be delivered exactly once across " +
        s"concurrent drains, got ${delivered.get}")
  }

  test("a catching-up consumer folds many versions into one endpoint-diff " +
      "batch (maxVersionsPerBatch), even when intermediates were retired") {
    val base = Files.createTempDirectory("graft-cdfs5").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft-cdfs5-ck").toString
    val v0 = seedTable(base)
    // 4 versions land while the consumer is away; retain=3 retires the
    // middle ones but the RANGE ENDPOINTS survive — the endpoint diff
    // still reads (changes() never touches intermediate versions)
    (1 to 4).foreach { i =>
      mergeInto(base, Seq((i.toLong, i * 1000L)).toDF("k", "v"), Seq("k"),
        UpdateMatched, insertUnmatched = false, marker = s"u$i", retain = 3)
    }
    // v0 itself must survive for the from-side: re-seed a fresh table
    // shape instead — here we bootstrap at the OLDEST retained version
    val retained = history(spark, base).select("version").collect()
      .map(_.getLong(0)).sorted
    val from = retained.head
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val n = changesStream(spark, base, Seq("k"), ckpt,
        startVersion = Some(from), maxVersionsPerBatch = 100L) { (feed, a, b) =>
      got += ((a, b))
      // one batch carries the whole net diff
      assert(feed.count() >= 1)
    }
    assert(n == 1L, s"the catch-up must fold into one batch, got $n")
    assert(got == Seq((from, retained.last)))
  }
}

package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** r15 timestamp time travel (`TIMESTAMP AS OF`): `history()` now carries
  * `committed_at` (marker mtime — staged milliseconds before the pointer
  * CAS, never rewritten afterwards), and `versionAsOf`/`readAsOf` resolve
  * an instant to the newest version committed at or before it. */
class SnapshotTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  test("readAsOf resolves an instant to the newest version committed at " +
      "or before it; pre-history instants are None; the future reads current") {
    val base = Files.createTempDirectory("graft-asof").resolve("t").toString
    mergeInto(base, Seq((1L, 1L)).toDF("k", "v"), Seq("k"), UpdateMatched,
      insertUnmatched = true, marker = "v0", retain = 10)
    Thread.sleep(30) // distinct mtimes (local FS is ms-resolution)
    mergeInto(base, Seq((1L, 2L)).toDF("k", "v"), Seq("k"), UpdateMatched,
      insertUnmatched = false, marker = "v1", retain = 10)
    Thread.sleep(30)
    mergeInto(base, Seq((1L, 3L)).toDF("k", "v"), Seq("k"), UpdateMatched,
      insertUnmatched = false, marker = "v2", retain = 10)
    val h = history(spark, base).select("version", "committed_at").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val vs = h.keys.toSeq.sorted
    assert(vs.size == 3)
    assert(vs.map(h) == vs.map(h).sorted, s"commit times must be monotone: $h")
    def vAt(k: Long): Long = readAsOf(spark, base, h(k)).get
      .filter(col("k") === 1L).collect().head.getLong(1)
    assert(vAt(vs(0)) == 1L && vAt(vs(1)) == 2L && vAt(vs(2)) == 3L,
      "each commit instant reads exactly that version")
    // between two commits: the earlier one
    assert(versionAsOf(spark, base, h(vs(1)) + (h(vs(2)) - h(vs(1))) / 2)
      .contains(vs(1)))
    assert(versionAsOf(spark, base, h(vs(0)) - 1).isEmpty,
      "an instant before retained history is an explicit None")
    assert(versionAsOf(spark, base, System.currentTimeMillis() + 3600000L)
      .contains(vs(2)), "the future reads current")
  }

  test("purge leaves commit times intact (markers are never rewritten), " +
      "so time travel across a purged history still resolves") {
    val base = Files.createTempDirectory("graft-asof2").resolve("t").toString
    mergeInto(base, (1L to 20L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed", retain = 10,
      numBuckets = 4)
    Thread.sleep(30)
    mergeInto(base, Seq((2L, 200L)).toDF("k", "v"), Seq("k"), UpdateMatched,
      insertUnmatched = false, marker = "up", retain = 10)
    val before = history(spark, base).select("version", "committed_at")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(purgeKeys(spark, base, Seq("k"), Seq(Seq(7L))) > 0)
    val after = history(spark, base).select("version", "committed_at")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    before.keys.foreach { v =>
      assert(after(v) == before(v),
        s"purge must not disturb v$v's commit time (lineage contract)")
    }
    // the pre-purge instant resolves, and its content is already purged
    // in place (erasure reaches history, not just current)
    val asOf = readAsOf(spark, base, before.values.max).get
    assert(asOf.filter(col("k") === 7L).count() == 0,
      "time travel must never resurrect a purged subject")
  }
}

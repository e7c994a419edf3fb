package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** The CDF face of erasure: purge rewrites BOTH endpoints of any version
  * diff in place, so `changes()` is structurally silent about purged
  * subjects — and a downstream consumer that ingested the subject before
  * the purge would hold it forever. [[VersionedSnapshot.changesWithPurges]]
  * closes the loop: every purge commit carries a `_PURGED` retraction
  * sidecar, and the feed unions one `op = "purge"` row (keys only,
  * values null — erased by design) per subject. */
class CdfPurgeSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("changes() is silent about purged subjects; changesWithPurges emits their retractions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cdfp").resolve("t").toString
    val seed = (0L until 20L).map(k => (k, k * 10)).toDF("k", "v")
    val v0 = VersionedSnapshot.mergeInto(base, seed, Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "seed", numBuckets = 4, retain = 10)
    VersionedSnapshot.mergeInto(base,
      (0L until 20L by 2).map(k => (k, k * 10 + 1)).toDF("k", "v"),
      Seq("k"), VersionedSnapshot.UpdateMatched, insertUnmatched = false,
      marker = "upd", retain = 10)
    VersionedSnapshot.purgeKeys(spark, base, Seq("k"), Seq(Seq(4L), Seq(5L)))
    val cur = VersionedSnapshot.currentVersion(spark, base).get

    // the plain diff: updated evens (minus purged 4), nothing for 4 or 5
    val plain = VersionedSnapshot.changes(spark, base, v0, cur, Seq("k")).get
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!plain.exists(_._2 == 4L) && !plain.exists(_._2 == 5L),
      s"the in-place purge should be invisible to the plain diff: $plain")
    assert(plain == (0L until 20L by 2).filterNot(_ == 4L)
      .map(("update", _)).toSet, s"diff rows wrong: $plain")

    // the purge-aware feed adds exactly the two retractions, values null
    val feed = VersionedSnapshot.changesWithPurges(spark, base, v0, cur, Seq("k")).get
    val purgeRows = feed.filter(col("op") === "purge").collect()
    assert(purgeRows.map(_.getLong(1)).toSet == Set(4L, 5L),
      s"retractions wrong: ${purgeRows.mkString(",")}")
    assert(purgeRows.forall(_.isNullAt(2)), "erased values must be null")
    val nonPurge = feed.filter(col("op") =!= "purge")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(nonPurge == plain, "the purge-aware feed must not disturb the diff rows")

    // a subject re-inserted AFTER the purge shows as a normal insert row
    // alongside its retraction — retraction-first consumption keeps it
    VersionedSnapshot.mergeInto(base, Seq((5L, 999L)).toDF("k", "v"),
      Seq("k"), VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "reinsert", retain = 10)
    val cur2 = VersionedSnapshot.currentVersion(spark, base).get
    val feed2 = VersionedSnapshot.changesWithPurges(spark, base, v0, cur2, Seq("k")).get
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed2.contains(("purge", 5L)) && feed2.contains(("insert", 5L)),
      s"re-inserted subject needs both its retraction and its new row: $feed2")

    // the pre/post-image feed (retraction-IVM input) carries the same
    // retractions; plain pre/post rows are undisturbed
    val pp = VersionedSnapshot.changesPrePostWithPurges(spark, base, v0, cur2, Seq("k")).get
    val ppPurge = pp.filter(col("op") === "purge").collect()
    assert(ppPurge.map(_.getLong(1)).toSet == Set(4L, 5L),
      s"pre/post feed retractions wrong: ${ppPurge.mkString(",")}")
    val ppPlain = VersionedSnapshot.changesPrePost(spark, base, v0, cur2, Seq("k")).get
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val ppNonPurge = pp.filter(col("op") =!= "purge")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ppNonPurge == ppPlain,
      "purge-aware pre/post feed must not disturb the image rows")

    // retraction-first fold over a derived copy equals the real table
    val derived = scala.collection.mutable.Map.empty[Long, Long]
    VersionedSnapshot.readVersion(spark, base, v0).get.collect()
      .foreach(r => derived(r.getLong(0)) = r.getLong(1))
    // NOTE: v0 was purged in place, so the derived state here starts
    // post-purge; to model a consumer that ingested PRE-purge state, put
    // the subjects back with their old values first
    derived(4L) = 40L; derived(5L) = 50L
    val rows = VersionedSnapshot.changesWithPurges(spark, base, v0, cur2, Seq("k")).get
      .collect().map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    rows.filter(_._1 == "purge").foreach { case (_, k, _) => derived.remove(k); () }
    rows.filterNot(_._1 == "purge").foreach {
      case ("insert", k, Some(v)) => derived(k) = v
      case ("update", k, Some(v)) => derived(k) = v
      case ("delete", k, _) => derived.remove(k); ()
      case other => fail(s"unexpected feed row $other")
    }
    val want = VersionedSnapshot.read(spark, base).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(derived.toMap == want,
      s"retraction-first fold diverged: ${derived.toMap} vs $want")
  }
}

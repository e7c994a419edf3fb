package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._

class PurgeKeysSpec extends SparkSpec {
  import spark.implicits._

  private def ids(base: String): Set[Long] =
    read(spark, base).get.select("k").collect().map(_.getLong(0)).toSet

  private def idsAt(base: String, v: Long): Set[Long] =
    readVersion(spark, base, v).get.select("k").collect().map(_.getLong(0)).toSet

  test("purge removes the subject from current AND retained history") {
    val base = Files.createTempDirectory("graft-purge1").resolve("t").toString
    mergeInto(base, Seq((42L, 1L), (7L, 1L), (9L, 1L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "b0",
      retain = 3, numBuckets = 8)
    mergeInto(base, Seq((7L, 2L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "b1",
      retain = 3, numBuckets = 8)
    val v2 = mergeInto(base, Seq((5L, 1L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "b2",
      retain = 3, numBuckets = 8)
    // 42 is visible at every retained version before the purge
    (v2 - 2 to v2).foreach(v => assert(idsAt(base, v).contains(42L)))

    val bucketsBefore = Files.readString(
      java.nio.file.Path.of(base, f"v$v2%05d", "_BUCKETS"))
    val n = purgeKeys(spark, base, Seq("k"), Seq(Seq(42L)))
    assert(n >= 1)

    // gone from the current read, from TIME TRAVEL, and from point lookups
    assert(ids(base) === Set(7L, 9L, 5L))
    (v2 - 2 to v2).foreach { v =>
      assert(!idsAt(base, v).contains(42L), s"42 still visible at v$v")
      assert(idsAt(base, v) - 42L === idsAt(base, v)) // others intact
    }
    assert(readForKeys(spark, base, Seq(42L).toDF("k")).map(_.count()).getOrElse(0L) === 0L)
    assert(readForKeys(spark, base, Seq(7L).toDF("k")).get
      .select("v").head().getLong(0) === 2L)

    // untouched buckets keep their manifest lines verbatim (inheritance)
    val bucketsAfter = Files.readString(
      java.nio.file.Path.of(base, f"v$v2%05d", "_BUCKETS"))
    val changedLines = bucketsBefore.linesIterator.toSet --
      bucketsAfter.linesIterator.toSet
    assert(changedLines.nonEmpty && changedLines.size < 8,
      s"only hit buckets may change, saw $changedLines")

    // the integrity manifest was refreshed in place
    assert(validateCurrent(spark, base))

    // reader grace: the OLD dirs survive the purge itself…
    val dataRoot = new java.io.File(base, "data")
    assert(dataRoot.listFiles().exists(_.getName.startsWith("p")))
    val oldDirs = dataRoot.listFiles().map(_.getName).filter(_.startsWith("g")).toSet
    assert(oldDirs.nonEmpty)
    // …and the next publish's orphan sweep reclaims whatever no retained
    // manifest references anymore
    mergeInto(base, Seq((11L, 1L)).toDF("k", "v"), Seq("k"), UpdateMatched,
      insertUnmatched = true, marker = "b3", retain = 3, numBuckets = 8)
    assert(ids(base) === Set(7L, 9L, 5L, 11L))
  }

  test("purge reaches merge-on-read overlays") {
    val base = Files.createTempDirectory("graft-purge2").resolve("t").toString
    mergeInto(base, Seq((1L, 1L), (2L, 1L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "b0",
      retain = 2, numBuckets = 4)
    stageDelta(base, Seq((3L, 9L), (2L, 5L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, marker = "d0", retain = 2, numBuckets = 4)
    assert(ids(base) === Set(1L, 2L, 3L))
    val n = purgeKeys(spark, base, Seq("k"), Seq(Seq(3L), Seq(2L)))
    assert(n >= 1)
    // 2 lived in a bucket file AND as an overlay upsert; 3 only in the
    // overlay — both fully forgotten, the reconcile read never resurrects
    assert(ids(base) === Set(1L))
    assert(validateCurrent(spark, base))
  }

  test("flat versions fail fast with nothing mutated") {
    val base = Files.createTempDirectory("graft-purge3").resolve("t").toString
    publish(Seq((1L, 1L), (2L, 2L)).toDF("k", "v"), base, marker = "b0")
    val e = intercept[IllegalStateException] {
      purgeKeys(spark, base, Seq("k"), Seq(Seq(1L)))
    }
    assert(e.getMessage.contains("bucketed layout"))
    assert(ids(base) === Set(1L, 2L)) // untouched
  }

  test("zonemap and bloom sidecars are regenerated, never left dangling") {
    val base = Files.createTempDirectory("graft-purge4").resolve("t").toString
    mergeInto(base, (1L to 40L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "b0",
      retain = 2, numBuckets = 4, keyBlooms = true)
    assert(purgeKeys(spark, base, Seq("k"), Seq(Seq(10L), Seq(20L))) >= 1)
    // every _ZONES entry of the current version points at a file on disk
    val (_, _, entries) = zoneManifest(spark, base).get
    entries.keys.foreach { rel =>
      assert(new java.io.File(base, rel).exists(), s"dangling zone entry $rel")
    }
    // pruned point reads still work on both sides of the purge
    assert(readForKeys(spark, base, Seq(10L).toDF("k")).map(_.count()).getOrElse(0L) === 0L)
    assert(readForKeys(spark, base, Seq(11L).toDF("k")).map(_.count()).getOrElse(0L) === 1L)
    assert(ids(base).size === 38)
    assert(validateCurrent(spark, base))
  }
}

package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** The explicit [[VersionedSnapshot.vacuum]] face: dry-run lists exactly
  * the dirs the publish-time sweep would reclaim (and what they cost),
  * `dryRun = false` deletes exactly those. Safety envelope pinned:
  * referenced generations are never listed, young orphans defer behind
  * the point-in-time-scan horizon, and the reclaim never disturbs the
  * committed table. */
class SnapshotVacuumSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def age(dir: java.io.File): Unit = {
    def walk(f: java.io.File): Unit = {
      f.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
      if (f.isDirectory) f.listFiles().foreach(walk)
    }
    walk(dir)
  }

  test("dry run prices orphans without deleting; the horizon defers young " +
      "dirs; reclaim deletes exactly the listed dirs and nothing live") {
    val base = tmp("graft-vac1")
    mergeInto(base, (1L to 30L).map(k => (k, k * 10)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)
    // full rewrite with retain=1: the seed generation is now orphaned,
    // but YOUNG — both the automatic sweep and vacuum must defer it
    compact(spark, base, Seq("k"), marker = "rewrite", retain = 1)
    val dataRoot = new java.io.File(base, "data")
    val gens = dataRoot.listFiles().filter(_.getName.startsWith("g")).sortBy(_.getName)
    assert(gens.length == 2, s"old generation survives the young-defer, got ${gens.map(_.getName).toSeq}")
    assert(vacuum(spark, base).isEmpty,
      "a young orphan is deferred, never listed")
    // past the horizon it becomes reclaimable — dry run lists and prices
    // it, touching nothing
    age(gens.head)
    val dry = vacuum(spark, base).collect()
    assert(dry.length == 1 &&
      dry(0).getString(0).endsWith(gens.head.getName) &&
      dry(0).getLong(1) > 0 && !dry(0).getBoolean(2),
      s"got ${dry.toSeq}")
    assert(gens.head.exists, "dry run must not delete")
    // reclaim deletes exactly the listed dir; the table is untouched
    val got = vacuum(spark, base, dryRun = false).collect()
    assert(got.length == 1 && got(0).getBoolean(2))
    assert(!gens.head.exists, "reclaim deletes the orphan")
    assert(gens.last.exists, "the live generation is never touched")
    assert(validateCurrent(spark, base))
    assert(read(spark, base).get.count() == 30)
  }

  test("referenced generations are never listed, however old") {
    val base = tmp("graft-vac2")
    mergeInto(base, (1L to 10L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    age(new java.io.File(base, "data"))
    assert(vacuum(spark, base).isEmpty,
      "a referenced generation must never appear, at any age")
  }
}

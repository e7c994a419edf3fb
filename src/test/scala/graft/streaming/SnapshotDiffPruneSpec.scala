package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared-ref pruning of the CDF diff ([[VersionedSnapshot.changes]] /
  * `changesPrePost` via `diffInputs`): a data ref carried by BOTH
  * endpoint manifests cannot contribute diff rows, so the diff binds
  * only the non-shared refs. These rows pin the optimization against a
  * brute-force reference diff computed here from the two full version
  * reads — across partial-rewrite carries, metadata-only commits
  * (rename, purge bump), purge's in-place ref swap, and the
  * merge-on-read fallback where pruning must NOT fire. */
class SnapshotDiffPruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  /** Brute-force reference diff: full-outer join of the two complete
    * version reads — independent of the pruned production path. */
  private def refDiff(base: String, from: Long, to: Long): Set[(String, Long, Long)] = {
    val a = readVersion(spark, base, from).get
      .select(col("k"), col("v").as("__a_v"), lit(true).as("__in_a"))
    val b = readVersion(spark, base, to).get
      .select(col("k"), col("v").as("__b_v"), lit(true).as("__in_b"))
    a.join(b, Seq("k"), "full_outer").collect().toSeq.flatMap { r =>
      val inA = !r.isNullAt(r.fieldIndex("__in_a"))
      val inB = !r.isNullAt(r.fieldIndex("__in_b"))
      val k = r.getLong(r.fieldIndex("k"))
      if (!inA) Some(("insert", k, r.getLong(r.fieldIndex("__b_v"))))
      else if (!inB) Some(("delete", k, r.getLong(r.fieldIndex("__a_v"))))
      else if (r.getLong(r.fieldIndex("__a_v")) != r.getLong(r.fieldIndex("__b_v")))
        Some(("update", k, r.getLong(r.fieldIndex("__b_v"))))
      else None
    }.toSet
  }

  private def gotDiff(base: String, from: Long, to: Long): Set[(String, Long, Long)] =
    changes(spark, base, from, to, Seq("k")).get
      .select("op", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("narrow merge: diff equals the brute-force reference while shared " +
      "buckets are pruned from both sides") {
    val base = tmp("graft-dp1")
    val v0 = mergeInto(base, (1L to 100L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 8)
    // touch a narrow slice: most buckets stay shared between v0 and v1
    val v1 = mergeInto(base, Seq((3L, 333L), (101L, 101L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "up",
      retain = 10)
    assert(gotDiff(base, v0, v1) == refDiff(base, v0, v1))
    assert(gotDiff(base, v0, v1) == Set(("update", 3L, 333L), ("insert", 101L, 101L)))
    // delete-only window
    val v2 = mergeInto(base, Seq((7L, 0L)).toDF("k", "v"), Seq("k"),
      DeleteMatched, insertUnmatched = false, marker = "del", retain = 10)
    assert(gotDiff(base, v1, v2) == refDiff(base, v1, v2))
    assert(gotDiff(base, v1, v2) == Set(("delete", 7L, 7L)))
    // spanning window folds both commits
    assert(gotDiff(base, v0, v2) == refDiff(base, v0, v2))
  }

  test("metadata-only commits (rename, purge bump) diff to EMPTY with " +
      "zero data files bound; purge retractions still flow") {
    val base = tmp("graft-dp2")
    val v0 = mergeInto(base, (1L to 50L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)
    val v1 = renameColumns(spark, base, Map("v" -> "val"))
    // rename boundary: physical bytes identical -> no diff rows, and the
    // pruned plan scans nothing (every ref shared verbatim)
    val feed = changes(spark, base, v0, v1, Seq("k")).get
    assert(feed.count() == 0L)
    val scanned = feed.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }).sum
    assert(scanned == 0, s"rename-boundary diff bound $scanned data files")
    // purge: in-place rewrite swaps refs in BOTH retained manifests, the
    // bump commit shares them verbatim -> empty plain diff, retraction
    // present in changesWithPurges
    purgeKeys(spark, base, Seq("k"), Seq(Seq(9L)))
    val v2 = currentVersion(spark, base).get
    assert(v2 > v1)
    assert(changes(spark, base, v1, v2, Seq("k")).get.count() == 0L)
    val wp = changesWithPurges(spark, base, v1, v2, Seq("k")).get
      .select("op", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(wp == Set(("purge", 9L)))
  }

  test("merge-on-read overlays disable pruning (fallback reads the " +
      "reconciled frames) and the diff stays exact") {
    val base = tmp("graft-dp3")
    val v0 = mergeInto(base, (1L to 40L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)
    val v1 = stageDelta(base, Seq((5L, 555L), (41L, 41L)).toDF("k", "v"),
      Seq("k"), UpdateMatched, marker = "overlay", retain = 10)
    assert(gotDiff(base, v0, v1) == refDiff(base, v0, v1))
    assert(gotDiff(base, v0, v1) == Set(("update", 5L, 555L), ("insert", 41L, 41L)))
  }
}

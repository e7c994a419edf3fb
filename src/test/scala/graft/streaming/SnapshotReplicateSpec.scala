package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** The one-call replication face ([[VersionedSnapshot.replicateTo]]):
  * bootstrap-then-tail a snapshot table into a replica via the CDF
  * stream. Pins: bootstrap equivalence; O(delta) incremental syncs that
  * converge through upserts, deletes AND purge retractions; the
  * retraction-first consumption order (a subject purged and re-inserted
  * inside one folded catch-up window survives as its re-inserted row);
  * idempotent re-calls; and durable-offset restart safety. */
class SnapshotReplicateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def rows(base: String): Set[(Long, Long)] =
    read(spark, base).get.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bootstrap + incremental syncs converge through upserts, deletes " +
      "and purge retractions; a re-call is a no-op") {
    val src = tmp("graft-repl1"); val dst = tmp("graft-repl1d")
    val ckpt = Files.createTempDirectory("graft-repl1-ck").toString
    mergeInto(src, (1L to 30L).map(k => (k, k * 10)).toDF("k", "v"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10) == 0L,
      "bootstrap applies the current version; no newer batches yet")
    assert(rows(dst) == rows(src), "bootstrap equivalence")

    mergeInto(src, Seq((2L, 222L), (99L, 990L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "up", retain = 10)
    mergeInto(src, Seq((3L, 0L)).toDF("k", "v"), Seq("k"),
      DeleteMatched, insertUnmatched = false, marker = "del", retain = 10)
    assert(purgeKeys(spark, src, Seq("k"), Seq(Seq(5L))) > 0)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10) == 3L,
      "three source versions -> three batches")
    assert(rows(dst) == rows(src), "incremental convergence")
    assert(!rows(dst).exists(_._1 == 5L),
      "the erasure reached the replica's current state")
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10) == 0L,
      "in sync: nothing re-delivered, nothing re-applied")
  }

  test("retraction-first order inside one folded catch-up window: a " +
      "subject purged then re-inserted survives as the re-inserted row") {
    val src = tmp("graft-repl2"); val dst = tmp("graft-repl2d")
    val ckpt = Files.createTempDirectory("graft-repl2-ck").toString
    mergeInto(src, (1L to 10L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    // purge 7, then re-insert it — BOTH land in one folded batch
    assert(purgeKeys(spark, src, Seq("k"), Seq(Seq(7L))) > 0)
    mergeInto(src, Seq((7L, 777L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "reinsert", retain = 10)
    val n = replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10,
      maxVersionsPerBatch = 10L)
    assert(n == 1L, s"the catch-up folds to ONE endpoint batch, got $n")
    assert(rows(dst) == rows(src))
    assert(rows(dst).contains((7L, 777L)),
      "purge-then-reinsert must survive as the re-inserted row")
  }

  test("lost-checkpoint recovery: the replica's own markers pin the sync " +
      "position, so a vanished offset resumes instead of diverging; a " +
      "FOREIGN committed target is refused loudly") {
    val src = tmp("graft-repl4"); val dst = tmp("graft-repl4d")
    val ckpt = Files.createTempDirectory("graft-repl4-ck").toString
    mergeInto(src, (1L to 10L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    mergeInto(src, Seq((4L, 444L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    // simulate the crash window / a lost checkpoint: the offset vanishes
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt, "_CDF_OFFSET"), false)
    val ckpt2 = Files.createTempDirectory("graft-repl4-ck2").toString
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt2, retain = 10) >= 1L,
      "marker-pinned resume must deliver the missed window")
    assert(rows(dst) == rows(src), "recovered without divergence")
    // a committed target with NO replicate markers refuses
    val foreign = tmp("graft-repl4f")
    mergeInto(foreign, Seq((1L, 1L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "not-a-replica",
      retain = 10, numBuckets = 2)
    val ckpt3 = Files.createTempDirectory("graft-repl4-ck3").toString
    val ex = intercept[IllegalArgumentException] {
      replicateTo(spark, src, foreign, Seq("k"), ckpt3, retain = 10)
    }
    assert(ex.getMessage.contains("foreign table"), ex.getMessage)
  }

  test("mid-batch crash + lost checkpoint: a batch is applied entirely " +
      "or not at all (single applyChanges merge), and recovery replays " +
      "an unapplied batch from the replica's markers") {
    val src = tmp("graft-repl5"); val dst = tmp("graft-repl5d")
    val ckpt = Files.createTempDirectory("graft-repl5-ck").toString
    mergeInto(src, (1L to 10L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    // one folded window holding BOTH a delete and an upsert — under the
    // r15 three-merge drain the crash seam could land between them
    // (half-applied batch); the r16 single per-row-action merge closes
    // that window structurally: the seam now fires BEFORE the only merge
    mergeInto(src, Seq((3L, 0L)).toDF("k", "v"), Seq("k"),
      DeleteMatched, insertUnmatched = false, marker = "del", retain = 10)
    mergeInto(src, Seq((8L, 888L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    spark.conf.set(VersionedSnapshot.TestFailBeforeReplicateUpsertConf, "*")
    try {
      val ex = intercept[IllegalStateException] {
        replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10,
          maxVersionsPerBatch = 10L)
      }
      assert(ex.getMessage.contains("spec seam"), ex.getMessage)
    } finally spark.conf.unset(VersionedSnapshot.TestFailBeforeReplicateUpsertConf)
    // NOTHING of the batch landed: no torn delete-without-upsert state
    assert(rows(dst).contains((3L, 3L)), "batch not applied: delete absent")
    assert(rows(dst).contains((8L, 8L)), "batch not applied: upsert absent")
    // checkpoint offset lost too: recovery has only the replica's
    // markers to pin the position — the unapplied batch must replay
    val ckpt2 = Files.createTempDirectory("graft-repl5-ck2").toString
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt2, retain = 10,
      maxVersionsPerBatch = 10L) >= 1L,
      "marker-pinned recovery must replay the unapplied batch")
    assert(rows(dst) == rows(src), "no silent divergence")
    assert(!rows(dst).exists(_._1 == 3L), "the batch's delete reached the replica")
    assert(rows(dst).contains((8L, 888L)),
      "the batch's upsert reached the replica")
  }

  test("source renames/drops propagate automatically: the replica applies " +
      "the same metadata commits and the sync converges under the new " +
      "names; propagateSchema=false keeps the loud behavior") {
    val src = tmp("graft-repl6"); val dst = tmp("graft-repl6d")
    val ckpt = Files.createTempDirectory("graft-repl6-ck").toString
    mergeInto(src, (1L to 10L).map(k => (k, k, s"t$k")).toDF("k", "v", "tag"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    // rename a non-key column, then a data change under the new name
    renameColumns(spark, src, Map("v" -> "val"))
    mergeInto(src, Seq((2L, 222L, "x")).toDF("k", "val", "tag"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10,
      maxVersionsPerBatch = 10L) == 1L)
    val dstDf = read(spark, dst).get
    assert(dstDf.columns.toSet == Set("k", "val", "tag"),
      s"rename did not propagate: ${dstDf.columns.mkString(",")}")
    assert(dstDf.filter(col("k") === 2L).select("val").head().getLong(0) == 222L)
    // a drop propagates the same way
    dropColumns(spark, src, Seq("tag"))
    mergeInto(src, Seq((3L, 333L)).toDF("k", "val"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up2", retain = 10)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10,
      maxVersionsPerBatch = 10L) == 1L)
    val dstDf2 = read(spark, dst).get
    assert(dstDf2.columns.toSet == Set("k", "val"),
      s"drop did not propagate: ${dstDf2.columns.mkString(",")}")
    assert(read(spark, src).get.select("k", "val").collect().toSet ==
      dstDf2.select("k", "val").collect().toSet)
    // opt-out: a fresh replica with propagateSchema=false hits the loud
    // schema-parity error when the source renames mid-stream
    val dst2 = tmp("graft-repl6e")
    val ckpt2 = Files.createTempDirectory("graft-repl6-ck2").toString
    replicateTo(spark, src, dst2, Seq("k"), ckpt2, retain = 10,
      propagateSchema = false)
    renameColumns(spark, src, Map("val" -> "v2"))
    mergeInto(src, Seq((4L, 4444L)).toDF("k", "v2"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up3", retain = 10)
    intercept[Exception] {
      replicateTo(spark, src, dst2, Seq("k"), ckpt2, retain = 10,
        propagateSchema = false, maxVersionsPerBatch = 10L)
    }
  }

  test("horizon loss: a replica that lagged past source retention raises " +
      "CdfHorizonLost by default; resyncOnHorizonLoss rebases with one " +
      "full-sync merge (deletes included) and the tail resumes") {
    val src = tmp("graft-repl7"); val dst = tmp("graft-repl7d")
    val ckpt = Files.createTempDirectory("graft-repl7-ck").toString
    mergeInto(src, (1L to 12L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 2, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    // churn far past retain=2: the replica's offset version is retired
    mergeInto(src, Seq((5L, 0L)).toDF("k", "v"), Seq("k"),
      DeleteMatched, insertUnmatched = false, marker = "del", retain = 2)
    (1 to 3).foreach { i =>
      mergeInto(src, Seq((1L, i * 100L)).toDF("k", "v"), Seq("k"),
        UpdateMatched, insertUnmatched = false, marker = s"u$i", retain = 2)
    }
    intercept[CdfHorizonLost] {
      replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    }
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10,
      resyncOnHorizonLoss = true) >= 1L)
    assert(rows(dst) == rows(src), "rebase must converge, deletes included")
    assert(!rows(dst).exists(_._1 == 5L))
    // and the tail keeps flowing incrementally after the rebase
    mergeInto(src, Seq((2L, 22L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "after", retain = 4)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10) == 1L)
    assert(rows(dst) == rows(src))
  }

  test("restart safety: a fresh call on the same checkpoint resumes from " +
      "the durable offset, never re-bootstrapping over the replica") {
    val src = tmp("graft-repl3"); val dst = tmp("graft-repl3d")
    val ckpt = Files.createTempDirectory("graft-repl3-ck").toString
    mergeInto(src, (1L to 10L).map(k => (k, k)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 2)
    replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10)
    val h0 = history(spark, dst).count()
    mergeInto(src, Seq((1L, 100L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    assert(replicateTo(spark, src, dst, Seq("k"), ckpt, retain = 10) == 1L)
    assert(rows(dst) == rows(src))
    assert(history(spark, dst).count() == h0 + 1,
      "exactly one replica commit per synced batch — no re-bootstrap")
  }
}

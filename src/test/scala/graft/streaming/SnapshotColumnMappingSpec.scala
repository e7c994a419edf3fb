package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** r15 column-mapping contract ([[VersionedSnapshot.renameColumns]] /
  * [[VersionedSnapshot.dropColumns]]) — rename/drop as ONE metadata
  * commit, the Delta column-mapping analog. The invariant under test:
  * physical parquet names are frozen at birth and only the per-version
  * `_COLMAP` view changes, so renames/drops cost O(metadata) at any
  * table size, every retained version keeps its own names under time
  * travel, CDF diffs across the boundary, merge/prune/purge keep working
  * through the translation, and the next compact NORMALIZES the physical
  * layout (reifying drops). */
class SnapshotColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def seed(base: String, n: Long = 40L): Long =
    mergeInto(base, (1L to n).map(k => (k, k * 10, s"s$k")).toDF("k", "v", "s"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)

  private def dataFileStamps(base: String): Set[(String, Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(base, "data"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.length, f.lastModified)).toSet
  }

  test("rename is metadata-only: zero data bytes touched, the new name is " +
      "live, time travel shows each version's OWN names") {
    val base = tmp("graft-cmap1")
    val v0 = seed(base)
    val stamps = dataFileStamps(base)
    val v1 = renameColumns(spark, base, Map("v" -> "value", "s" -> "label"))
    assert(v1 == v0 + 1)
    assert(dataFileStamps(base) == stamps,
      "a rename must not touch one data byte")
    assert(read(spark, base).get.columns.toSeq == Seq("k", "value", "label"))
    assert(readVersion(spark, base, v0).get.columns.toSeq == Seq("k", "v", "s"),
      "the pre-rename version keeps its old names under time travel")
    val got = read(spark, base).get.filter(col("k") === 7L)
      .select("value", "label").collect()
    assert(got.length == 1 && got(0).getLong(0) == 70L && got(0).getString(1) == "s7")
  }

  test("merges, key-pruned point reads and range reads keep working " +
      "through a KEY rename — callers just use the new name") {
    val base = tmp("graft-cmap2")
    seed(base)
    renameColumns(spark, base, Map("k" -> "id", "v" -> "value"))
    // O(delta) merge on the renamed key
    mergeInto(base, Seq((3L, 333L, "u3"), (99L, 990L, "n99")).toDF("id", "value", "s"),
      Seq("id"), UpdateMatched, insertUnmatched = true, marker = "up", retain = 10)
    val all = read(spark, base).get
    assert(all.columns.toSeq == Seq("id", "value", "s"))
    assert(all.count() == 41)
    // zone/bloom-pruned point read under the new key name
    val point = readForKeys(spark, base, Seq(3L, 99L, 11L).toDF("id")).get
      .select("id", "value").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(point == Set((3L, 333L), (99L, 990L), (11L, 110L)))
    // value-range read under the renamed value column: seed rows 30..40
    // (value 300..400) + the upsert (333) + the insert (990)
    val ranged = readWhere(spark, base, Map("value" -> (Some(300L), None))).get
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ranged == ((30L to 40L).toSet + 3L + 99L), s"got $ranged")
  }

  test("CDF diffs ACROSS a rename boundary: the from-side is presented " +
      "through the to-side's view instead of erroring") {
    val base = tmp("graft-cmap3")
    val v0 = seed(base)
    renameColumns(spark, base, Map("v" -> "value"))
    val v2 = mergeInto(base, Seq((5L, 555L, "u5")).toDF("k", "value", "s"),
      Seq("k"), UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    val diff = changes(spark, base, v0, v2, Seq("k")).get
    assert(diff.columns.toSet == Set("op", "k", "value", "s"),
      "the feed speaks the NEWER view's names")
    val rows = diff.select("op", "k", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("update", 5L, 555L)))
  }

  test("drop is view-level until compact REIFIES it: bytes remain, the " +
      "column vanishes from reads, compact removes the bytes and frees " +
      "the physical slot for re-adding") {
    val base = tmp("graft-cmap4")
    seed(base)
    dropColumns(spark, base, Seq("s"))
    assert(read(spark, base).get.columns.toSeq == Seq("k", "v"))
    // the BYTES are still there (privacy note in the scaladoc): raw files
    // keep the physical column until a compact
    val rawCols = spark.read.parquet(
      new java.io.File(base, "data").listFiles().head.getPath).columns.toSet
    assert(rawCols.contains("s"), "drop must be metadata-only until compact")
    // merges against the narrowed view keep working (new files pad the
    // dropped physical with nulls for schema uniformity)
    mergeInto(base, Seq((2L, 222L)).toDF("k", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    assert(read(spark, base).get.filter(col("k") === 2L)
      .select("v").head().getLong(0) == 222L)
    // re-adding a same-named column before the reifying compact is refused
    val ex = intercept[IllegalArgumentException] {
      mergeInto(base, Seq((50L, 500L, "x")).toDF("k", "v", "s"), Seq("k"),
        UpdateMatched, insertUnmatched = true, marker = "re-add", retain = 10,
        evolveSchema = true)
    }
    assert(ex.getMessage.contains("occupied"), ex.getMessage)
    // compact reifies: the new generation physically lacks the column
    compact(spark, base, Seq("k"), marker = "reify", retain = 1)
    val gen = new java.io.File(base, "data").listFiles()
      .filter(_.getName.startsWith("g")).maxBy(_.getName)
    def anyParquet(d: java.io.File): java.io.File = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).filter(_.getName.endsWith(".parquet")).head
    }
    assert(!spark.read.parquet(anyParquet(gen).getPath).columns.contains("s"),
      "compact must physically remove the dropped column's bytes")
    // ...and the physical slot is free again
    mergeInto(base, Seq((50L, 500L, "fresh")).toDF("k", "v", "s"), Seq("k"),
      UpdateMatched, insertUnmatched = true, marker = "re-add", retain = 10,
      evolveSchema = true)
    assert(read(spark, base).get.filter(col("k") === 50L)
      .select("s").head().getString(0) == "fresh")
  }

  test("swap-chains apply simultaneously over the current view, and " +
      "compact NORMALIZES physical := logical") {
    val base = tmp("graft-cmap5")
    seed(base)
    // v -> w and s -> v in one commit: the old 'v' slot is re-used
    // logically while its physical name stays frozen
    renameColumns(spark, base, Map("v" -> "w", "s" -> "v"))
    val got = read(spark, base).get.filter(col("k") === 4L)
      .select("w", "v").head()
    assert(got.getLong(0) == 40L && got.getString(1) == "s4")
    compact(spark, base, Seq("k"), marker = "normalize", retain = 1)
    assert(read(spark, base).get.columns.toSeq == Seq("k", "w", "v"))
    val gen = new java.io.File(base, "data").listFiles()
      .filter(_.getName.startsWith("g")).maxBy(_.getName)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val rawCols = spark.read.parquet(walk(gen)
      .filter(_.getName.endsWith(".parquet")).head.getPath).columns.toSet
    assert(rawCols == Set("k", "w", "v"),
      s"normalized physical names must equal the logical view, got $rawCols")
    // post-normalization merges under the plain names
    mergeInto(base, Seq((1L, 11L, "z1")).toDF("k", "w", "v"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    assert(read(spark, base).get.filter(col("k") === 1L)
      .select("w").head().getLong(0) == 11L)
  }

  test("CDF diff ACROSS a normalize-compact boundary: origin lineage " +
      "joins the re-frozen physicals, so renamed columns still align") {
    val base = tmp("graft-cmap5b")
    val v0 = seed(base)
    renameColumns(spark, base, Map("v" -> "w"))
    // normalization re-freezes physical := logical (files now carry 'w')
    compact(spark, base, Seq("k"), marker = "normalize", retain = 10)
    mergeInto(base, Seq((2L, 222L, "u2")).toDF("k", "w", "s"), Seq("k"),
      UpdateMatched, insertUnmatched = false, marker = "up", retain = 10)
    val cur = currentVersion(spark, base).get
    // pre-fix this threw UNRESOLVED_COLUMN: the from-side (physical 'v')
    // was presented through the to-version's IDENTITY colmap
    val feed = changes(spark, base, v0, cur, Seq("k")).get
    assert(feed.columns.toSet == Set("op", "k", "w", "s"))
    val rows = feed.collect().map(r => (r.getAs[String]("op"),
      r.getAs[Long]("k"), r.getAs[Long]("w"))).toSet
    assert(rows == Set(("update", 2L, 222L)),
      s"exactly the one update must diff across the boundary, got ${rows.toSeq}")
    // and the other direction: a post-normalize version read AS the
    // pre-normalize view keeps the OLD names
    assert(readVersion(spark, base, v0).get.columns.toSeq == Seq("k", "v", "s"))
  }

  test("GDPR purge across a normalize-compact boundary with a renamed " +
      "key: pre-normalize files speak the OLD physical name and must " +
      "still be erased (a current-names-only probe silently misses them)") {
    val base = tmp("graft-cmap5c")
    val v0 = seed(base)
    renameColumns(spark, base, Map("k" -> "id", "v" -> "w"))
    // keep generous retention so PRE-normalize versions stay retained —
    // their files carry physical 'k', the post-normalize ones 'id'
    compact(spark, base, Seq("id"), marker = "normalize", retain = 10)
    mergeInto(base, Seq((70L, 700L, "n70")).toDF("id", "w", "s"), Seq("id"),
      UpdateMatched, insertUnmatched = true, marker = "up", retain = 10)
    assert(purgeKeys(spark, base, Seq("id"), Seq(Seq(9L))) > 0)
    assert(read(spark, base).get.filter(col("id") === 9L).count() == 0)
    // the erasure reached the PRE-normalize retained versions too
    assert(readVersion(spark, base, v0).get.filter(col("k") === 9L).count() == 0,
      "subject must be erased from pre-normalize retained history")
    // and the pre-normalize generation's OTHER rows survived the rewrite
    assert(readVersion(spark, base, v0).get.count() == 39)
  }

  test("merge-on-read overlays after a rename: the staged delta speaks " +
      "the new names and reconciles against pre-rename bucket files") {
    val base = tmp("graft-cmap6")
    seed(base)
    renameColumns(spark, base, Map("v" -> "value"))
    stageDelta(base, Seq((6L, 666L, "d6")).toDF("k", "value", "s"), Seq("k"),
      UpdateMatched, marker = "overlay", retain = 10)
    stageDelta(base, Seq((7L, 0L, "x")).toDF("k", "value", "s"), Seq("k"),
      DeleteMatched, marker = "del", retain = 10)
    val got = read(spark, base).get
    assert(got.count() == 39)
    assert(got.filter(col("k") === 6L).select("value").head().getLong(0) == 666L)
    // compact folds the overlays and normalizes
    compact(spark, base, Seq("k"), marker = "fold", retain = 1)
    assert(read(spark, base).get.count() == 39)
  }

  test("GDPR purge through a renamed view: subjects erase under the new " +
      "key name and the retraction feed speaks the logical names") {
    val base = tmp("graft-cmap7")
    val v0 = seed(base)
    renameColumns(spark, base, Map("k" -> "id"))
    assert(purgeKeys(spark, base, Seq("id"), Seq(Seq(9L))) > 0)
    assert(read(spark, base).get.filter(col("id") === 9L).count() == 0)
    // even the PRE-RENAME retained version forgot the subject
    assert(readVersion(spark, base, v0).get.filter(col("k") === 9L).count() == 0)
    val cur = history(spark, base).select(max("version")).head().getLong(0)
    val feed = changesWithPurges(spark, base, v0, cur, Seq("id")).get
    val purgeRows = feed.filter(col("op") === "purge")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(purgeRows == Set(9L), "the retraction must carry the logical key")
  }

  test("restore of a pre-rename version brings the old view back; a " +
      "shallow clone of a renamed table carries the view") {
    val base = tmp("graft-cmap8")
    val v0 = seed(base)
    renameColumns(spark, base, Map("v" -> "value"))
    val dst = tmp("graft-cmap8c")
    cloneTo(spark, base, dst)
    assert(read(spark, dst).get.columns.toSeq == Seq("k", "value", "s"),
      "the clone presents the renamed view")
    restore(spark, base, v0, retain = 10)
    assert(read(spark, base).get.columns.toSeq == Seq("k", "v", "s"),
      "restore resurrects that version's own column view")
  }

  test("guard rails: unknown column, collisions, reserved and malformed " +
      "names are all refused before any commit") {
    val base = tmp("graft-cmap9")
    seed(base)
    intercept[IllegalArgumentException] {
      renameColumns(spark, base, Map("nope" -> "x"))
    }
    intercept[IllegalArgumentException] {
      renameColumns(spark, base, Map("v" -> "s")) // collides with live 's'
    }
    intercept[IllegalArgumentException] {
      renameColumns(spark, base, Map("v" -> "__v"))
    }
    intercept[IllegalArgumentException] {
      renameColumns(spark, base, Map("v" -> "a,b"))
    }
    intercept[IllegalArgumentException] {
      dropColumns(spark, base, Seq("k", "v", "s"))
    }
    assert(read(spark, base).get.columns.toSeq == Seq("k", "v", "s"),
      "no refused call may have committed anything")
  }
}

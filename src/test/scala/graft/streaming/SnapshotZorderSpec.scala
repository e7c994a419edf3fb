package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** r15 `compact(zorderBy = …)` — the OPTIMIZE ZORDER BY analog over the
  * versioned table's clustered rewrite. Pins: (1) content preservation
  * (a curve-clustered compact is still maintenance); (2) the pruning
  * claim itself — on a 2-D grid, a box predicate over BOTH dimensions
  * binds strictly fewer files after a Z-order compact than after a
  * lexicographic clusterBy compact of the same data, because the
  * per-file `_ZONES` ranges are tight on both dimensions instead of
  * only the leading one; (3) single-dimension pruning does not regress. */
class SnapshotZorderSpec extends SparkSpec {
  import spark.implicits._

  // a 100×100 grid: x = k % 100, y = k / 100 — the adversarial shape for
  // lexicographic clustering (every x-run spans the full y range)
  private def grid = (0L until 10000L)
    .map(k => (k, k % 100L, k / 100L)).toDF("k", "x", "y")

  private def build(zorder: Boolean): String = {
    val base = Files.createTempDirectory(
      s"graft-zo-${if (zorder) "z" else "lin"}").resolve("t").toString
    mergeInto(base, grid, Seq("k"), UpdateMatched, insertUnmatched = true,
      marker = "seed", retain = 4, numBuckets = 2)
    // ~10 files per bucket so sub-bucket file pruning has something to do
    compact(spark, base, Seq("k"), marker = "optimize", retain = 4,
      valueStatsCols = Some(Seq("x", "y")), maxRecordsPerFile = 500L,
      clusterBy = if (zorder) Nil else Seq("x", "y"),
      zorderBy = if (zorder) Seq("x", "y") else Nil)
    base
  }

  private def boxFiles(base: String, lo: Long, hi: Long): Int =
    readWhere(spark, base, Map(
      "x" -> (Some(lo), Some(hi)), "y" -> (Some(lo), Some(hi)))).get
      .inputFiles.length

  test("zorder compact preserves content exactly and both dimensions' " +
      "box queries return the same rows as the linear layout") {
    val zBase = build(zorder = true)
    val got = read(spark, zBase).get.select("k", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == grid.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "curve-clustered compact must be content-preserving")
    val box = readWhere(spark, zBase, Map(
      "x" -> (Some(10L), Some(19L)), "y" -> (Some(10L), Some(19L)))).get
      .filter(col("x").between(10, 19) && col("y").between(10, 19))
    assert(box.count() == 100L, "the 10×10 box holds exactly 100 grid rows")
  }

  test("a trailing-dimension predicate prunes files on the Z-ordered " +
      "layout and binds (nearly) everything on the lexicographic one — " +
      "the claim Z-order exists for") {
    val zBase = build(zorder = true)
    val linBase = build(zorder = false)
    val zTotal = read(spark, zBase).get.inputFiles.length
    val linTotal = read(spark, linBase).get.inputFiles.length
    assert(zTotal >= 8 && linTotal >= 8,
      s"need multi-file buckets for the comparison (z=$zTotal lin=$linTotal)")
    def yFiles(base: String): Int =
      readWhere(spark, base, Map("y" -> (Some(10L), Some(19L)))).get
        .inputFiles.length
    val (zY, linY) = (yFiles(zBase), yFiles(linBase))
    // lexicographic sorts by (x, y): every file spans the full y range, so
    // a y predicate prunes NOTHING; the curve gives every file a tight y
    // range too
    assert(linY >= linTotal - 2,
      s"precondition: the linear layout cannot prune on y (bound $linY of $linTotal)")
    assert(zY * 2 <= linY,
      s"z-order must out-prune the linear layout at least 2x on the " +
        s"trailing dimension (z=$zY of $zTotal, linear=$linY of $linTotal)")
    // and the 2-D box never does worse than lexicographic
    val (zBox, linBox) = (boxFiles(zBase, 10L, 19L), boxFiles(linBase, 10L, 19L))
    assert(zBox <= linBox,
      s"2-D box: z=$zBox of $zTotal vs linear=$linBox of $linTotal")
  }

  test("single-dimension range pruning does not regress under z-order") {
    val zBase = build(zorder = true)
    val zTotal = read(spark, zBase).get.inputFiles.length
    val xOnly = readWhere(spark, zBase,
      Map("x" -> (Some(0L), Some(9L)))).get.inputFiles.length
    val yOnly = readWhere(spark, zBase,
      Map("y" -> (Some(0L), Some(9L)))).get.inputFiles.length
    assert(xOnly < zTotal && yOnly < zTotal,
      s"either single dimension must still prune (x=$xOnly, y=$yOnly of $zTotal)")
  }
}

package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.streaming.VersionedSnapshot._
import org.apache.spark.sql.functions._

/** Column-mapping commits ride the same optimistic CAS as every other
  * publish, so they must SERIALIZE against concurrent writers: whichever
  * side loses the pointer race retries against the winner's state, and a
  * writer whose source still speaks the pre-rename names gets the LOUD
  * schema-parity error (it re-reads the view and retries) — never a lost
  * update, never a silently mis-named column. */
class SnapshotRenameRaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def seed(base: String): Long =
    mergeInto(base, (1L to 30L).map(k => (k, k * 10, s"s$k")).toDF("k", "v", "s"),
      Seq("k"), UpdateMatched, insertUnmatched = true, marker = "seed",
      retain = 10, numBuckets = 4)

  test("a rename racing a merge serializes on the CAS — both effects " +
      "land, the writer re-reads the view after a schema-drift loss") {
    val base = tmp("graft-rnrace1")
    seed(base)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val merger = new Thread(() => {
      try {
        // a real writer's shape: each attempt re-reads the CURRENT view
        // to name its source columns; a rename landing mid-attempt
        // surfaces as the loud schema-parity IllegalArgumentException,
        // which the writer absorbs by re-reading and retrying
        var done = false
        var tries = 0
        while (!done && tries < 30) {
          tries += 1
          try {
            retryOnConflict() {
              val vName =
                if (read(spark, base).get.columns.contains("value")) "value"
                else "v"
              mergeInto(base,
                Seq((1L, 999L, "m1")).toDF("k", vName, "s"),
                Seq("k"), UpdateMatched, insertUnmatched = false,
                marker = "race-up", retain = 10)
            }
            done = true
          } catch { case _: IllegalArgumentException => Thread.sleep(20) }
        }
        if (!done) sys.error("merge never landed")
      } catch { case t: Throwable => errs.add(t); () }
    }, "graft-race-merger")
    val renamer = new Thread(() => {
      try retryOnConflict() {
        renameColumns(spark, base, Map("v" -> "value"))
      } catch { case t: Throwable => errs.add(t); () }
    }, "graft-race-renamer")
    merger.start(); renamer.start()
    merger.join(120000); renamer.join(120000)
    assert(errs.isEmpty, s"both writers must land: ${errs.peek}")
    val r = read(spark, base).get
    assert(r.columns.toSeq == Seq("k", "value", "s"),
      "the rename landed")
    assert(r.filter(col("k") === 1L).select("value").head().getLong(0) == 999L,
      "the merge landed under whichever view won")
    assert(r.count() == 30)
  }

  test("two disjoint renames race: the CAS serializes them and both " +
      "mappings survive composition") {
    val base = tmp("graft-rnrace2")
    seed(base)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val ths = Seq("v" -> "value", "s" -> "label").map { case (from, to) =>
      new Thread(() => {
        try retryOnConflict() {
          renameColumns(spark, base, Map(from -> to))
        } catch { case t: Throwable => errs.add(t); () }
      }, s"graft-race-rn-$from")
    }
    ths.foreach(_.start()); ths.foreach(_.join(120000))
    assert(errs.isEmpty, s"both renames must land: ${errs.peek}")
    assert(read(spark, base).get.columns.toSeq == Seq("k", "value", "label"))
    // content untouched throughout
    assert(read(spark, base).get.filter(col("k") === 5L)
      .select("value", "label").head().toSeq == Seq(50L, "s5"))
  }
}

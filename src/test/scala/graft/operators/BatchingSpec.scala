package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class BatchingSpec extends SparkSpec {

  private def docs(lens: Seq[Long]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(lens.zipWithIndex.map { case (l, i) => Row(i.toLong, l) }, 5),
      StructType(Seq(StructField("id", LongType), StructField("len", LongType))))

  test("assignment matches the per-bucket window reference") {
    val lens = (0 until 200).map(i => (i * 37 % 500).toLong)
    val got = Batching.lengthGrouped(docs(lens), "id", col("len"), bucketWidth = 100, batchSize = 8)
      .select("id", "bucket", "batch_in_bucket", "pos_in_batch").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val ref = lens.zipWithIndex
      .map { case (l, i) => (i.toLong, l / 100) }
      .groupBy(_._2).flatMap { case (b, rows) =>
        rows.map(_._1).sorted.zipWithIndex.map { case (id, k) =>
          id -> ((b, k.toLong / 8, k % 8))
        }
      }
    assert(got == ref.toMap)
  }

  test("batches are homogeneous in bucket and tightly packed") {
    val lens = (0 until 300).map(i => (i % 7 * 50).toLong)
    val out = Batching.lengthGrouped(docs(lens), "id", col("len"), 100, 16)
      .groupBy("bucket", "batch_in_bucket")
      .agg(count(lit(1)).as("n"), max("pos_in_batch").as("mx"))
      .collect()
    // every batch except possibly the last per bucket is full
    val byBucket = out.groupBy(_.getLong(0))
    for ((_, batches) <- byBucket) {
      val sorted = batches.sortBy(_.getLong(1))
      for (b <- sorted.dropRight(1)) assert(b.getLong(2) == 16 && b.getInt(3) == 15)
      assert(sorted.last.getLong(2) <= 16)
    }
  }

  test("assignment survives repartitioning and a downstream coalesce(1)") {
    val lens = (0 until 120).map(i => (i * 13 % 400).toLong)
    def run(parts: Int) =
      Batching.lengthGrouped(docs(lens).repartition(parts), "id", col("len"), 100, 8)
        .coalesce(1).select("id", "bucket", "batch_in_bucket", "pos_in_batch").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(run(2) == run(9))
  }
}

package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i % 100, s"f$i")).toDF("k", "payload")
    val dims = (0 until 100).map(i => (i, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_bkt_facts", "k", buckets = 8)
    Bucketing.writeBucketed(dims, "graft_bkt_dims", "k", buckets = 8)
    try {
      val joined = Bucketing.joinBucketed(spark, "graft_bkt_facts", "graft_bkt_dims", "k")
      assert(joined.count() == 1000)
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join should have no shuffle exchange")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }

  test("partitioned layout prunes at the file-listing level") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 300).map(i => (i, Seq("a", "b", "c")(i % 3))).toDF("id", "part")
    df.write.mode("overwrite").partitionBy("part").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("part") === "a")
    assert(pruned.count() == 100)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    // only the matching partition directory is selected for the scan
    assert(scan.get.relation.location.inputFiles.forall(_.contains("part=a"))
      || scan.get.metadata.get("PartitionFilters").exists(_.contains("part")))
  }
}

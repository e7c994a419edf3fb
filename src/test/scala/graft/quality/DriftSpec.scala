package graft.quality

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("train", 1L), ("train", 1L), ("train", 2L), ("train", 2L),
    ("val", 1L), ("val", 3L)
  ).toDF("split", "bucket")

  test("splitHistogram: per-split fractions and TV contribution") {
    val out = Drift.splitHistogram(rows, "split", "bucket", Seq("train", "val"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // train: 2/4, 2/4 over buckets 1,2; val: 1/2, 1/2 over buckets 1,3
    assert(out(1L) == ((1L, 500000L, 500000L, 0L)))
    assert(out(2L) == ((2L, 500000L, 0L, 500000L)))     // val never hits 2
    assert(out(3L) == ((3L, 0L, 500000L, 500000L)))     // train never hits 3
    // TV distance = ½·Σ|p−q| = ½·(0 + .5 + .5) = 0.5 — the report's sum/2
    assert(out.values.map(_._4).sum == 1000000L)
  }

  test("splitHistogram: extra splits get frac columns but TV stays first-two") {
    val df = (rows.collect().map(r => (r.getString(0), r.getLong(1))).toSeq :+
      ("test" -> 1L)).toDF("split", "bucket")
    val out = Drift.splitHistogram(df, "split", "bucket", Seq("train", "val", "test"))
    assert(out.columns.toSeq ==
      Seq("bucket", "frac_train_e6", "frac_val_e6", "frac_test_e6", "tv_e6"))
    val b1 = out.where($"bucket" === 1L).head()
    assert(b1.getLong(3) == 1000000L) // test is 100% bucket 1
    assert(b1.getLong(4) == 0L)       // tv still train-vs-val
  }

  test("splitHistogram rejects fewer than two splits") {
    intercept[IllegalArgumentException] {
      Drift.splitHistogram(rows, "split", "bucket", Seq("train"))
    }
  }
}

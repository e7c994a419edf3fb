package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")

  test("merge of per-batch partials equals a full recompute") {
    val full = Incremental.partials(batch(1 to 100), Seq("k"), col("v"))
      .collect().map(_.toSeq).toSet
    val merged = Incremental.merge(Seq(
        Incremental.partials(batch(1 to 40), Seq("k"), col("v")),
        Incremental.partials(batch(41 to 90), Seq("k"), col("v")),
        Incremental.partials(batch(91 to 100), Seq("k"), col("v"))),
      Seq("k")).collect().map(_.toSeq).toSet
    assert(merged == full)
  }

  test("merge is order-insensitive and handles keys absent from a batch") {
    val a = Incremental.partials(Seq(("x", 1L), ("y", 5L)).toDF("k", "v"), Seq("k"), col("v"))
    val b = Incremental.partials(Seq(("x", 3L)).toDF("k", "v"), Seq("k"), col("v"))
    val ab = Incremental.merge(Seq(a, b), Seq("k")).collect().map(_.toSeq).toSet
    val ba = Incremental.merge(Seq(b, a), Seq("k")).collect().map(_.toSeq).toSet
    assert(ab == ba)
    val x = Incremental.merge(Seq(a, b), Seq("k")).filter($"k" === "x").head()
    assert(x.getAs[Long]("n") == 2 && x.getAs[Long]("sum_v") == 4)
    assert(x.getAs[Long]("min_v") == 1 && x.getAs[Long]("max_v") == 3)
  }

  test("withAvg derives avg from partials without breaking mergeability") {
    val snap = Incremental.withAvg(
      Incremental.partials(Seq(("x", 1L), ("x", 2L)).toDF("k", "v"), Seq("k"), col("v")))
    assert(snap.head().getAs[Double]("avg_v") == 1.5)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups, values overlap across batches on purpose
  private def batch(r: Range) = r.map(i => (s"g${i % 3}", i % 500)).toDF("g", "v")

  test("estimate is within HLL error bounds of the exact distinct count") {
    val est = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 3000), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 3000).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.1, s"group $g: est=${est(g)} exact=$n")
    }
  }

  test("merge law: merged batch sketches estimate the union within bounds") {
    // NOT exact equality: sparse→dense promotion points depend on the
    // merge path (see Sketches scaladoc); the guarantee is the error bound
    val whole = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 2000), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val merged = Sketches.withEstimate(Sketches.mergeSketches(Seq(
        Sketches.distinctSketch(batch(1 to 900), Seq("g"), "v"),
        Sketches.distinctSketch(batch(700 to 2000), Seq("g"), "v")),
      Seq("g")))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 2000).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.1,
        s"merged $g: ${merged(g)} vs exact $n")
      assert(math.abs(merged(g) - whole(g)).toDouble / n < 0.1,
        s"merge-path drift $g: ${merged(g)} vs ${whole(g)}")
    }
  }

  test("sketch estimates stay within bounds across partition layouts") {
    def run(parts: Int) = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 1500).repartition(parts), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 1500).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    Seq(run(2), run(11)).foreach(est => exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.1, s"$g: ${est(g)} vs $n")
    })
  }
}

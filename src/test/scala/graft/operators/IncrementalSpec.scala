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

  test("joinDelta: maintained view equals full rejoin, terms are disjoint, multi-matches kept") {
    // multi-row matches on both sides; k=3 arrives ONLY via deltas (both
    // sides), k=4's left rows are old but its right row is new
    val aOld = Seq((1, "a1"), (1, "a2"), (2, "a3"), (4, "a4")).toDF("k", "av")
    val bOld = Seq((1, "b1"), (2, "b2"), (2, "b3")).toDF("k", "bv")
    val aDelta = Seq((1, "a5"), (3, "a6")).toDF("k", "av")
    val bDelta = Seq((3, "b4"), (4, "b5")).toDF("k", "bv")
    val aFull = aOld.unionByName(aDelta); val bFull = bOld.unionByName(bDelta)
    val maintained = aOld.join(bOld, Seq("k"))
      .unionByName(Incremental.joinDelta(aOld, bOld, aDelta, bDelta, Seq("k")))
    // multiset equality (duplicates matter in a join view)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(maintained) == bag(aFull.join(bFull, Seq("k"))),
      "V_old ∪ ΔV must equal the full rejoin as a multiset")
    // non-key collision is rejected loudly
    intercept[IllegalArgumentException] {
      Incremental.joinDelta(aOld, bOld.withColumnRenamed("bv", "av"),
        aDelta, bDelta.withColumnRenamed("bv", "av"), Seq("k"))
    }
  }

  test("retractable aggregates: any merge order equals the live-row aggregate; emptied keys vanish") {
    import spark.implicits._
    // g1: two inserts, one retract → n=1 sum=10; g2: insert then retract → gone
    val b1 = Seq(("g1", 10L, 1), ("g1", 7L, 1), ("g2", 5L, 1)).toDF("g", "v", "op")
    val b2 = Seq(("g1", 7L, -1), ("g2", 5L, -1)).toDF("g", "v", "op")
    def partsOf(dfs: Seq[org.apache.spark.sql.DataFrame]) =
      dfs.map(d => Incremental.retractPartials(d, Seq("g"), col("v"), col("op")))
    val fwd = Incremental.retractMerge(partsOf(Seq(b1, b2)), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val rev = Incremental.retractMerge(partsOf(Seq(b2, b1)), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    assert(fwd == Set(("g1", 1L, 10L)))
    assert(rev == fwd, "retraction merge must be delivery-order independent")
  }

  test("retractable aggregates fail loudly on corrupt changelogs") {
    import spark.implicits._
    // bad op value
    val badOp = Seq(("g", 1L, 2)).toDF("g", "v", "op")
    assertThrows[Exception] {
      Incremental.retractPartials(badOp, Seq("g"), col("v"), col("op")).collect()
    }
    // retraction without a matching insert → negative net count
    val orphan = Seq(("g", 1L, -1)).toDF("g", "v", "op")
    assertThrows[Exception] {
      Incremental.retractMerge(
        Seq(Incremental.retractPartials(orphan, Seq("g"), col("v"), col("op"))),
        Seq("g")).collect()
    }
  }
}

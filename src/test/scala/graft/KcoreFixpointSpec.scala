package graft

import org.apache.spark.sql.functions._

/** `dup_graph_kcore` peels adaptively to the 2-core FIXPOINT, while its
  * DuckDB oracle unrolls exactly 4 peel rounds. The two agree iff the
  * test corpora converge within 4 rounds — this spec asserts exactly
  * that, so a corpus change that slows convergence fails HERE instead of
  * surfacing as an opaque oracle hash mismatch. */
class KcoreFixpointSpec extends SparkSpec {

  test("2-core peel reaches its fixpoint within the oracle's 4 unrolled rounds (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    // the same pair relation the registered query pins (fresh derivation
    // here: the spec must not depend on SparkEntry's session cache)
    var edges = graft.operators.Dedup.jaccardPairs(
        Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.2)
      .select("id_a", "id_b").localCheckpoint()
    var n = edges.count()
    var rounds = 0
    var changed = n > 0
    while (changed) {
      val keep = edges.select(col("id_a").as("id"))
        .unionByName(edges.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2).select("id")
      val next = edges
        .join(keep.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
        .join(keep.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
        .localCheckpoint()
      val m = next.count()
      changed = m < n
      if (changed) rounds += 1
      edges = next; n = m
    }
    assert(n > 0, "degenerate corpus: the 2-core is empty, the spec proves nothing")
    assert(rounds <= 4,
      s"fixpoint needed $rounds effective peel rounds — the 4-round unrolled " +
        "DuckDB oracle no longer matches; re-derive the oracle depth")
    // and the registered query returns exactly this fixpoint's degrees
    val expected = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = SparkEntry.queries("dup_graph_kcore")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}

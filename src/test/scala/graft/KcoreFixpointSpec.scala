package graft

import org.apache.spark.sql.functions._

/** `dup_graph_kcore` peels adaptively but is CAPPED at
  * [[SparkEntry.KcoreMaxRounds]] — the same constant its generated
  * DuckDB oracle unrolls to, so engine and oracle agree at any
  * convergence speed by construction. This spec pins the two remaining
  * facts that construction doesn't give for free: the test corpora reach
  * the true fixpoint within the cap (so the registered result IS the
  * 2-core, not a truncation), and the registered query returns exactly
  * the fixpoint's degrees. */
class KcoreFixpointSpec extends SparkSpec {

  test("2-core peel reaches its fixpoint within the shared round cap (sf0.001)") {
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
    assert(rounds <= SparkEntry.KcoreMaxRounds,
      s"fixpoint needed $rounds effective peel rounds — beyond the " +
        s"${SparkEntry.KcoreMaxRounds}-round shared cap the registered query " +
        "returns a (still oracle-consistent) truncation, not the 2-core; " +
        "raise KcoreMaxRounds if the corpus legitimately needs more rounds")
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

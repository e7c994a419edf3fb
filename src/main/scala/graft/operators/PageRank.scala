package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — link-graph importance for corpus curation
  * (rank web documents by their link neighborhood before quality
  * filtering, as in Common-Crawl-derived training sets).
  *
  * Same DataFrame-iteration discipline as [[Components]]: each round is
  * one equi-join (ranks → out-edges) + one key-partitioned aggregation of
  * contributions, `localCheckpoint` truncates lineage, the driver never
  * sees row data. Dangling mass (vertices with no out-edges) is
  * redistributed uniformly each round — computed as a one-row aggregate —
  * so ranks keep summing to 1 and results match the standard power-method
  * formulation (Page et al. 1999; damping d=0.85).
  *
  * Runs a FIXED iteration count rather than a convergence test: at 100 TB
  * a per-round global delta is an extra aggregation over all vertices,
  * and the power method's geometric convergence (d^k) makes k=10..20 the
  * standard stopping rule. No DuckDB oracle is registered: ranks are
  * iterated double sums whose value depends on summation order — correct
  * results are spec'd against closed-form graphs (ring = uniform,
  * star = hub dominance) instead of hash-compared.
  */
object PageRank {

  /** (src, dst) edges → (id, rank); ranks sum to 1 (±1e-9, spec'd). */
  def run(edges: DataFrame, src: String, dst: String,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .distinct().localCheckpoint()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val nV = vertices.count()
    require(nV > 0, "empty graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    var ranks = vertices.withColumn("rank", lit(1.0 / nV))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      // mass of dangling vertices, redistributed uniformly. Kept INSIDE the
      // plan as a one-row aggregate broadcast-joined into the update — a
      // driver-side head() here would launch a second job per iteration
      // (the eager localCheckpoint below is already one); folding it in
      // halves the job count and the driver still never sees row data.
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dangling_mass"))
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .select(col("id"), (col("rank") / col("out_deg")).as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("vid"))
        .agg(sum("share").as("in_mass"))
      ranks = vertices
        .join(contribs, vertices("id") === col("vid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / nV) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dangling_mass") / nV)).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise evidence ("A≈B", "B≈C") into duplicate FAMILIES
  * ({A,B,C} → keep one), without which chained near-dups survive pairwise
  * dedup. Component id = the minimum vertex id reachable, so cluster
  * labels are deterministic and stable under input order.
  *
  * Algorithm: iterative min-label propagation (the DataFrame form of the
  * classic large-graph CC used by Pregel/GraphX and the Hash-to-Min line
  * of work, Rastogi et al. 2013): each round every vertex takes the min of
  * its own label and its neighbors' labels; converges in O(component
  * diameter) rounds. Near-dup families are small and dense (diameter ≤
  * ~4), so the loop runs 3–5 rounds in practice — each round is one
  * equi-join + one aggregation, all key-partitioned shuffles. The driver
  * sees only a per-round changed-count scalar (convergence test), never
  * the data. Labels are checkpointed to truncate lineage growth across
  * iterations (localCheckpoint — no cluster checkpoint dir needed).
  */
object Components {

  /** Pairs (idA, idB) → (id, cluster_id) for every vertex in `pairs`.
    * `maxIter` bounds the loop; throws if not converged by then (raise it
    * for pathological chain-shaped graphs, diameter = chain length). */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
      maxIter: Int = 20): DataFrame = {
    // materialize ONCE: edges are referenced every round, and leaving them
    // lazy re-runs the whole upstream pair-generation (e.g. a Jaccard
    // candidate join) per iteration — measured 3× the operator's cost
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge dst, the src's current label
      val neighborMin = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("nid"))
        .agg(min(col("cluster_id")).as("neighbor_min"))
      // carry the previous label through the update so convergence is a
      // filter-count over the (already materialized) checkpoint, not
      // another join against the old labels
      val updated = labels
        .join(neighborMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("cluster_id").as("__old"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val changed = updated.filter(col("cluster_id") =!= col("__old")).count()
      labels = updated.select("id", "cluster_id")
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}

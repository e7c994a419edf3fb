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

  /** Per-node triangle counts over an undirected pair list — the density
    * diagnostic of a duplicate graph: components say WHICH docs belong
    * together, triangles say how strongly (a clique of n mutual near-dups
    * carries C(n−1,2) triangles per node; a chain of borderline pairs
    * carries none, and chains are where transitive dedup over-merges).
    *
    * Algorithm: degree-ordered wedge counting (the MPS / Suri-Vassilvitskii
    * node-iterator++ form, WWW '11): orient every edge from its
    * (degree, id)-smaller endpoint to the larger, enumerate wedges at the
    * ORIENTED source only, close them against the canonical edge set. The
    * orientation bounds out-degree by O(√m) on any graph, so wedge count —
    * the join's fan-out, Σ d_out² — is O(m^1.5) worst-case instead of the
    * naive Σ d² (which a single hub node makes quadratic). Each triangle
    * is emitted exactly once, at its orientation-minimal vertex; the
    * per-node count then explodes the 3 corners and aggregates. All three
    * steps are key-partitioned equi-joins/aggs — no driver state, no
    * iteration; the triangle SET is orientation-independent, so an oracle
    * may enumerate canonically-ordered (a<b<c) triples instead.
    *
    * Output: (id, n_triangles) for every node in ≥1 triangle. */
  def triangleCounts(pairs: DataFrame, idA: String, idB: String): DataFrame = {
    // canonical undirected edge set: (a < b), self-loops dropped, deduped
    val e = pairs
      .select(least(col(idA), col(idB)).as("a"), greatest(col(idA), col(idB)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      // referenced three times below (degree, wedge legs, closing probe);
      // pin it or the upstream pair generation (an LSH candidate join)
      // replans per reference
      .localCheckpoint()
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // wedges at u: unordered neighbor pairs {v, w} with v < w (canonical —
    // each wedge once), closed iff canonical edge (v, w) exists
    val e2 = oriented.select(col("u").as("u2"), col("v").as("w"))
    val wedges = oriented.join(e2, col("u") === col("u2") && col("v") < col("w"))
      .select(col("u"), col("v"), col("w"))
    val triangles = wedges.join(e,
      wedges("v") === e("a") && wedges("w") === e("b"), "left_semi")
    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}

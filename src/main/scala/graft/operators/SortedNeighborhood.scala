package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking for entity resolution (Hernández &
  * Stolfo '95): sort the corpus by a fuzzy blocking key and emit
  * candidate pairs only within a fixed-size sliding window of the
  * sorted order. Linear-output blocking — ≤ `window` pairs per record —
  * that catches near-keys EXACT-equality blocking misses (typos or
  * prefix drift land adjacent in sort order even when not equal), the
  * classic complement to the hash-blocking families already here
  * (MinHash bands, SimHash blocks, exact fingerprints).
  *
  * Scale shape: the global ordering comes from
  * [[GlobalIndex.withGlobalIndex]] (range repartition + per-partition
  * offsets — NEVER a single-task `row_number` window), and the window
  * pairing is a self EQUI-join on the dense rank (`rn_b = rn_a + j`,
  * `j ∈ 1..window` exploded), so pairs that straddle range-partition
  * boundaries are found by the join's own shuffle — no sentinel-row
  * replication, no boundary loss, no Cartesian anywhere. Total cost:
  * one range shuffle + one hash-join shuffle, output ≤ n·window rows.
  *
  * Output: (idA, idB, rank_dist) with `idA` the sort-order predecessor;
  * `rank_dist` ∈ 1..window is the gap in the sorted order. Downstream a
  * matcher (edit distance, gram Jaccard, …) scores the pairs — blocking
  * only bounds the candidate set.
  */
object SortedNeighborhood {

  /** Multi-pass SNM — the standard production form: one sliding-window
    * pass PER blocking key, unioned and deduped (Hernández-Stolfo §4:
    * several cheap fuzzy keys beat one expensive one, because a typo
    * that breaks key A's sort locality rarely breaks key B's too).
    * Output pairs are canonical (id_a < id_b) with `n_passes` = how many
    * key orderings proposed the pair — a matcher-confidence prior.
    * Cost: `keys.size` independent linear passes; the union's dedup is
    * one shuffle over the (already linear) candidate set. */
  def candidatePairsMultiKey(df: DataFrame, idCol: String,
      keyCols: Seq[String], window: Int): DataFrame = {
    require(keyCols.nonEmpty, "need at least one blocking key")
    keyCols.map { k =>
        candidatePairs(df, idCol, k, window)
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
      }
      .reduce(_.unionAll(_))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_passes"))
  }

  /** Candidate pairs within `window` positions of the total order
    * (`keyCol`, `idCol`) — the id tiebreak makes the permutation, and
    * therefore the pair set, deterministic for any key collisions. */
  def candidatePairs(df: DataFrame, idCol: String, keyCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window must cover at least the adjacent record")
    // both legs of the window join read the ranked relation —
    // materialize the (rare) global-index pass once instead of running
    // its range shuffle + offset aggregate per reference
    val ranked = GlobalIndex.withGlobalIndex(
        df.select(col(idCol), col(keyCol)), "__rn",
        col(keyCol).asc, col(idCol).asc)
      .localCheckpoint()
    val right = ranked.select(col("__rn").as("__rn_b"),
      col(idCol).as("__id_b"), col(keyCol).as("__key_b"))
    ranked
      .select(col("__rn"), col(idCol), col(keyCol),
        explode(sequence(lit(1), lit(window))).as("rank_dist"))
      .join(right, col("__rn") + col("rank_dist") === col("__rn_b"))
      .select(col(idCol).as("id_a"), col("__id_b").as("id_b"),
        col(keyCol).as("key_a"), col("__key_b").as("key_b"),
        col("rank_dist").cast("long").as("rank_dist"))
  }
}

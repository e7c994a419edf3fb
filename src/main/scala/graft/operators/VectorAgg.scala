package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level aggregations over embedding columns — the cluster-statistics
  * primitives (centroids for IVF codebook refresh / k-means steps, norms for
  * cosine pre-normalization) a training pipeline runs over the full corpus.
  *
  * Centroids use the LONG form (group, pos, mean): `posexplode` fans each
  * vector into per-dimension rows, but partial aggregation collapses them
  * map-side, so the shuffle carries only |groups|·dim partials — not
  * rows·dim. That is the declarative, Catalyst-optimizable shape; a typed
  * Aggregator over float arrays would save the explode at the cost of
  * leaving whole-stage codegen (measured slower at this dim).
  */
object VectorAgg {

  /** Per-group per-dimension mean: (grpCol, pos, mean) with pos 0-based.
    * `decimals` rounds for cross-engine comparability. */
  def centroids(df: DataFrame, grpCol: String, vecCol: String,
      decimals: Int = 6): DataFrame =
    df.select(col(grpCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col(grpCol), col("pos"))
      .agg(round(avg("x"), decimals).as("mean"))

  /** Per-row L2 norm via the codegen dot-product loop: (idCol, l2). */
  def norms(df: DataFrame, idCol: String, vecCol: String,
      decimals: Int = 6): DataFrame =
    df.select(col(idCol), round(Vectors.l2Norm(col(vecCol)), decimals).as("l2"))
}

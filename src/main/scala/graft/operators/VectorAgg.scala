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

  /** Per-DIMENSION corpus health stats — the embedding-monitoring pass a
    * pipeline runs after every encoder change: (pos, n, n_zero, min, max,
    * mean_e6). Dead dimensions (n_zero = n, or min = max) and range
    * outliers surface here before they silently poison every downstream
    * cosine. Mean is a sum of PER-ELEMENT e6-quantized integers — exact,
    * order-independent, engine-portable (a float `avg` would hang the
    * comparison on summation order); min/max are exact element values.
    *
    * Scale shape: same long form as [[centroids]] — map-side partials
    * collapse the explode, the shuffle carries dim-many partials. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        sum(floor(col("x") * lit(1e6) + lit(0.5)).cast("long")).as("__s"))
      .select(col("pos"), col("n"), col("n_zero"), col("min_x"), col("max_x"),
        floor(col("__s").cast("double") / col("n").cast("double") + lit(0.5))
          .cast("long").as("mean_e6"))
}

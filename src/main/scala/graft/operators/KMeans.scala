package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the trained
  * upgrade for the pseudo-centroid codebooks used by
  * [[Similarity.ivfTopK]] and [[Similarity.semanticNearDupPairs]] (train
  * here, then feed the returned centroids in as the codebook).
  *
  * Execution shape per iteration (the only shape that works at 100 TB):
  *  - centroids live in a BROADCAST literal relation (k·dim doubles —
  *    driver-held, like any trained model);
  *  - assignment is one pass over the data: score k centroid dots per row,
  *    pick argmin by squared distance (ranking window over k rows per id);
  *  - the update is ONE hash aggregation on the long-form (cell, dim)
  *    relation (the same shape as `VectorAgg.centroids`): map-side combine
  *    reduces each task's contribution to k·dim partial sums, so the
  *    shuffle never carries vectors;
  *  - the driver sees k rows per iteration (the new centroids), nothing
  *    data-sized.
  *
  * Initialization is deterministic: the k corpus vectors with the smallest
  * portable hash of their id (same rule as the pseudo-codebook) — so runs
  * are reproducible with no stored seed state.
  *
  * No oracle is registered for the training loop by design: iterated
  * floating-point means are order-sensitive in the last ulp, so
  * cross-engine hash comparison is meaningless (same documented reasoning
  * as PageRank); correctness is pinned by closed-form fixtures in
  * `KMeansSpec` instead. */
object KMeans {

  /** Train `k` centroids with `iters` Lloyd iterations. Returns (cell,
    * centroid: array<double>, n_members) — cell ids are 0-based dense
    * ranks of the surviving centroids. Empty cells are dropped (their
    * members re-assign next iteration, the standard Lloyd behavior). */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val base = Similarity.withNorm(df, idCol, vecCol)
      .select(col(idCol), col("vec"))
      .localCheckpoint() // referenced every iteration — pin, don't re-scan lineage
    val spark = df.sparkSession
    import spark.implicits._

    var centroids: Seq[(Long, Seq[Double])] = base
      .withColumn("__h", graft.functions.PortableHash.hash60(col(idCol)))
      .orderBy("__h").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
      .toSeq

    var result: Seq[(Long, Seq[Double], Long)] = Seq.empty
    for (_ <- 0 until iters) {
      val cents = centroids.toDF("cell", "centvec")
      val byDist = Window.partitionBy(col(idCol))
        .orderBy(col("__d2").asc, col("cell").asc)
      val assigned = base.join(broadcast(cents), lit(true))
        .withColumn("__d2",
          Vectors.dot(col("vec"), col("vec"))
            - lit(2.0) * Vectors.dot(col("vec"), col("centvec"))
            + Vectors.dot(col("centvec"), col("centvec")))
        .withColumn("__rn", row_number().over(byDist))
        .filter(col("__rn") === 1)
        .select(col(idCol), col("cell"), col("vec"))
      // long-form update: k·dim aggregate rows reach the driver, no vectors
      val sums = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      result = sums.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex
        .map { case ((_, rs), i) =>
          val n = rs.head._4
          (i.toLong, rs.sortBy(_._2).map(_._3 / n).toSeq, n)
        }
      centroids = result.map(r => (r._1, r._2))
    }
    result.toDF("cell", "centroid", "n_members")
  }
}

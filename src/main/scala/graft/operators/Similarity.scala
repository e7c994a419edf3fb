package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Two tiers, same answer shape:
  *  - [[bruteForceTopK]] — exact cosine top-k: block nested-loop join with
  *    norms precomputed once per vector. Correctness baseline; cost is
  *    |queries| × |corpus|, so bound the query side.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus is bucketed by sign
  *    pattern; each query only scores its own bucket (plus multi-probe
  *    neighbors at Hamming distance 1). Candidate generation is an
  *    equi-join on bucket id → linear shuffle, the 100 TB path.
  *  - [[ivfTopK]] — IVF-style: k-means-free variant that uses `nlist`
  *    pseudo-centroids sampled deterministically from the corpus; each
  *    vector is assigned to its nearest centroid (broadcast), queries probe
  *    `nprobe` nearest cells.
  */
object Similarity {

  /** Vectors with precomputed double-cast embedding and L2 norm — compute
    * once, reuse across every pairwise comparison. */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol),
      col(vecCol).cast("array<double>").as("vec"),
      Vectors.l2Norm(col(vecCol)).as("norm"))

  /** Exact cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k by
    * (similarity DESC, neighbor_id ASC) — deterministic ties. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Random-hyperplane signature: `nBits` sign bits of dot(vec, h_i), where
    * hyperplane components are derived deterministically from xxhash64 —
    * reproducible across runs with no stored model. */
  private def hyperplaneSig(vec: org.apache.spark.sql.Column, dim: Int, nBits: Int): org.apache.spark.sql.Column = {
    val bits = (0 until nBits).map { b =>
      // h_b[j] in {-1,+1} from the parity of xxhash64(b, j): a cheap
      // Rademacher hyperplane (standard SRP-LSH construction).
      val dotH = aggregate(
        zip_with(
          col("vec"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => when(xxhash64(lit(b), j).bitwiseAND(1L) === 0L, 1.0).otherwise(-1.0)),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotH >= 0, lit(1L) << b).otherwise(0L)
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** LSH-bucketed approximate top-k: queries score only corpus vectors in
    * the same sign-pattern bucket (multi-probe: plus all buckets at Hamming
    * distance 1, which bounds recall loss). Same output shape as
    * [[bruteForceTopK]]; `rank` may have gaps vs exact when a true
    * neighbor hashes far away — that is the documented accuracy trade. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, nBits: Int, k: Int): DataFrame = {
    val base = withNorm(df, idCol, vecCol).withColumn("bucket", hyperplaneSig(col("vec"), dim, nBits))
    // multi-probe: each query also probes buckets differing in exactly 1 bit
    val probes = base.select(
      col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"),
      explode(concat(
        array(col("bucket")),
        transform(sequence(lit(0), lit(nBits - 1)),
          b => col("bucket").bitwiseXOR(lit(1L) << b)))).as("bucket"))
    val corpus = base.select(
      col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"), col("bucket"))
    val scored = probes.join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** IVF-style partitioned search with deterministic pseudo-centroids: the
    * `nlist` corpus vectors with the smallest xxhash64(id) act as centroids
    * (reproducible, model-free). Each corpus vector is assigned to its
    * nearest centroid; each query probes the `nprobe` nearest cells. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
    val centroids = base
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nlist)
      .select(col(idCol).as("cell"), col("vec").as("centvec"), col("norm").as("centnorm"))
    def nearestCells(v: DataFrame, n: Int, outPrefix: String): DataFrame = {
      val scored = v.join(broadcast(centroids), lit(true))
        .withColumn("__sim", Vectors.dot(col("vec"), col("centvec")) / (col("norm") * col("centnorm")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cell").asc)
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
        .select(col(idCol), col("vec"), col("norm"), col("cell"))
    }
    val assigned = nearestCells(base, 1, "c")
      .select(col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"), col("cell"))
    val probed = nearestCells(base, nprobe, "q")
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"), col("cell"))
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine ≥ threshold. Exact form is an all-pairs comparison — callers
    * bound one side or use [[lshTopK]] at scale. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
    val a = base.select(col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val b = base.select(col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }
}

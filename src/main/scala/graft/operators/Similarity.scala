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

  /** Hard cap on the corpus size the exact all-pairs operators will accept
    * (override via spark.conf `graft.similarity.maxExactRows`). The
    * brute-force paths are |Q|×|C| — correct as oracles, catastrophic as
    * the default path at 100 TB; the gate makes the scale-out choice
    * explicit instead of silent. */
  private val MaxExactRowsKey = "graft.similarity.maxExactRows"
  private val MaxExactRowsDefault = 100000L

  private def gateExact(df: DataFrame, op: String): Unit = {
    val max = df.sparkSession.conf.getOption(MaxExactRowsKey).map(_.toLong)
      .getOrElse(MaxExactRowsDefault)
    val n = df.limit((max + 1).toInt).count()
    require(n <= max,
      s"$op is an exact all-pairs operator and the corpus exceeds $max rows " +
        s"(set $MaxExactRowsKey to raise, or use lshTopK/ivfTopK — the scale path)")
  }

  /** Vectors with precomputed double-cast embedding and L2 norm — compute
    * once, reuse across every pairwise comparison. Widened first: a small
    * single-row-group embedding file scans as ONE task, which would
    * serialize the entire pairwise stage on one core. */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    Partitions.widen(df.select(col(idCol), col(vecCol)), col(idCol))
      .select(
        col(idCol),
        col(vecCol).cast("array<double>").as("vec"),
        Vectors.l2Norm(col(vecCol)).as("norm"))

  /** Exact cosine top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k by
    * (similarity DESC, neighbor_id ASC) — deterministic ties. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    gateExact(corpus, "bruteForceTopK")
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    // round(6) before ranking: float-sum order differs across engines by
    // ~1 ulp; ranking on the rounded value + id tie-break makes the top-k
    // set reproducible and oracle-comparable.
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        round(Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Random-hyperplane signature: `nBits` sign bits of dot(vec, h_i).
    * Hyperplane components are Rademacher ±1 values derived driver-side from
    * a splitmix64-style mix of (bit, component) — reproducible across runs
    * with no stored model, and baked into the plan as array literals so
    * codegen folds them (no per-row hyperplane recomputation). */
  private[operators] def rademacher(b: Int, dim: Int): Seq[Double] =
    Seq.tabulate(dim) { j =>
      var z = b.toLong * 0x9E3779B97F4A7C15L + j.toLong + 1L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  private def hyperplaneSig(vec: org.apache.spark.sql.Column, dim: Int, nBits: Int): org.apache.spark.sql.Column = {
    val bits = (0 until nBits).map { b =>
      val dotH = aggregate(
        zip_with(vec, typedlit(rademacher(b, dim)), (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotH >= 0, lit(1L << b)).otherwise(0L)
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
        array((0 until nBits).map(b => col("bucket").bitwiseXOR(lit(1L << b))): _*))).as("bucket"))
    val corpus = base.select(
      col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"), col("bucket"))
    val scored = probes.join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        round(Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")), 6))
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
    // Centroids are collected driver-side ONCE (nlist rows — tiny by
    // construction, like any trained IVF codebook) and re-enter the plan as
    // a literal local relation: the assignment and probe joins each
    // reference `centroids`, and leaving it as a subplan would re-execute
    // the scan+sort+limit once per reference.
    val centroidRows = base
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nlist)
      .select(col(idCol).cast("long").as("cell"), col("vec"), col("norm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSeq
    val session = df.sparkSession
    import session.implicits._
    val centroids = centroidRows.toDF("cell", "centvec", "centnorm")
    // One centroid-scoring pass + one ranking window serves both roles:
    // rank 1 = the vector's cell (assignment), rank ≤ nprobe = the cells
    // it probes as a query.
    val wCells = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cell").asc)
    val ranked = base.join(broadcast(centroids), lit(true))
      .withColumn("__sim", Vectors.dot(col("vec"), col("centvec")) / (col("norm") * col("centnorm")))
      .withColumn("__rn", row_number().over(wCells))
      .filter(col("__rn") <= math.max(1, nprobe))
      .select(col(idCol), col("vec"), col("norm"), col("cell"), col("__rn"))
    val assigned = ranked.filter(col("__rn") === 1)
      .select(col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"), col("cell"))
    val probed = ranked
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"), col("cell"))
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        round(Vectors.dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")), 6))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Scale path for embedding near-dup: LSH-bucketed candidate pairs
    * (same sign-pattern bucket, or differing in exactly one bit via the
    * corpus-side probe expansion), scored exactly, thresholded. Shuffle
    * volume is linear in corpus size; recall loss is bounded by the
    * bucket-collision probability at the chosen `nBits` (cos θ ≥ t pairs
    * agree on a random hyperplane with prob 1 − θ/π). */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int, threshold: Double): DataFrame = {
    val base = withNorm(df, idCol, vecCol).withColumn("bucket", hyperplaneSig(col("vec"), dim, nBits))
    // expand ONE side into Hamming-1 probes so near-boundary pairs meet
    val probes = base.select(
      col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"),
      explode(concat(
        array(col("bucket")),
        array((0 until nBits).map(b => col("bucket").bitwiseXOR(lit(1L << b))): _*))).as("bucket"))
    val corpus = base.select(
      col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"), col("bucket"))
    probes.join(corpus, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine_sim", round(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine ≥ threshold. Exact form is an all-pairs comparison (size-gated)
    * — the oracle for [[lshNearDupPairs]], the scale path. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    gateExact(df, "embeddingNearDupPairs")
    val base = withNorm(df, idCol, vecCol)
    val a = base.select(col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val b = base.select(col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }
}

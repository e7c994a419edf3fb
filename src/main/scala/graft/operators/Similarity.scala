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
    // clamp: a cap configured at/above Int.MaxValue would overflow limit()'s
    // Int argument — treat such caps as "gate disabled"
    val n = df.limit(math.min(max + 1, Int.MaxValue.toLong).toInt).count()
    require(n <= max,
      s"$op is an exact all-pairs operator and the corpus exceeds $max rows " +
        s"(set $MaxExactRowsKey to raise, or use lshTopK/ivfTopK — the scale path)")
  }

  /** Rounded cosine with a zero-norm guard: a zero embedding (they exist
    * in real corpora — empty inputs, dead encoder rows) yields NULL
    * similarity instead of an ANSI DIVIDE_BY_ZERO task failure. NULL
    * never passes a `>= threshold` filter and sorts last in the ranking
    * windows, so zero vectors simply match nothing. */
  private def cosineSim(dotC: org.apache.spark.sql.Column,
      normProd: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(normProd =!= 0.0, round(dotC / normProd, 6))

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
        cosineSim(Vectors.dot(col("qvec"), col("cvec")), col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Exact cosine top-k for a bounded, deterministic QUERY PANEL against
    * the FULL corpus — the scale-safe exact leg of a recall harness.
    *
    * The panel is the `panelSize` ids with the smallest
    * [[graft.functions.PortableHash.hash60]] — the same reproducible-subset
    * rule the IVF pseudo-centroids use, so the panel is identical across
    * runs, engines, and corpus partitionings (and the DuckDB oracle can
    * reproduce it with an ORDER BY/LIMIT). The panel is broadcast and the
    * corpus streams past it exactly once: cost is panelSize × |corpus| —
    * LINEAR in corpus size, so unlike [[bruteForceTopK]] this needs no
    * `gateExact` clamp and runs at any scale. This is the standard recall
    * protocol (rank a sampled query set exactly, compare the index's
    * answer), and the number it produces — recall@k over the panel — is
    * what decides nBits/tables/nprobe BEFORE a 100 TB index build.
    *
    * Output: (query_id, neighbor_id, cosine_sim, rank) for panel queries
    * only, rank 1..k by (similarity DESC, neighbor_id ASC). */
  def panelExactTopK(df: DataFrame, idCol: String, vecCol: String,
      panelSize: Int, k: Int): DataFrame =
    panelTopKAgainst(df, df, idCol, vecCol, panelSize, k)

  /** [[panelExactTopK]] generalized to distinct panel-source and corpus
    * relations: the panel is hash-sampled from `panelFrom` at FULL
    * precision while the ranked side is `corpus` — typically a lossy
    * re-representation of the same vectors (int8-dequantized codes, PQ
    * reconstructions). That asymmetry — exact query, compressed corpus —
    * is the ADC serving convention of every quantized ANN tier, and this
    * form measures what ranking quality survives the compression. Same
    * cost shape as the exact leg: panelSize × |corpus|, linear, ungated. */
  def panelTopKAgainst(panelFrom: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, panelSize: Int, k: Int): DataFrame = {
    require(panelSize >= 1, "panelSize must be >= 1")
    val panel = withNorm(panelFrom, idCol, vecCol)
      .withColumn("__h", graft.functions.PortableHash.hash60(col(idCol)))
      .orderBy(col("__h").asc, col(idCol).asc).limit(panelSize)
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, idCol, vecCol).select(
      col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val scored = c.join(broadcast(panel), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        cosineSim(Vectors.dot(col("qvec"), col("cvec")), col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** Late-interaction (ColBERT-style MaxSim) retrieval over MULTI-VECTOR
    * documents: each document is represented by a GROUP of token-level
    * vectors and scored against a query document as
    *
    *   MaxSim(q, d) = Σ_{qv ∈ q} max_{dv ∈ d} cos(qv, dv)
    *
    * — every query vector picks its best-matching document vector and the
    * per-token maxima sum (Khattab & Zaharia, SIGIR '20). This is the
    * retrieval family between single-vector ANN (loses token locality)
    * and full cross-encoders (can't be indexed at all); relationally it
    * is two cascaded aggregations over a vector-pair join, which is why
    * it fits the engine as a plain declarative plan.
    *
    * Documents are derived from consecutive vector ids (`id div
    * groupSize` — the deterministic grouping the synthetic corpus
    * supports); queries are the `panelSize` documents with the smallest
    * portable hash of their doc id, the same reproducible-panel rule as
    * [[panelExactTopK]]. Scale shape: the panel's vectors (panelSize ×
    * groupSize rows) BROADCAST and the corpus streams past them once —
    * linear in corpus, no gate; the two aggregations reduce
    * (panel·docs·groupSize) → (panel·docs) rows with map-side partial
    * combine before the only shuffle. At 100 TB the same plan serves
    * with an LSH/IVF candidate join replacing the panel broadcast
    * (candidate generation per QUERY VECTOR, then the identical
    * max-then-sum reduction — the MaxSim layer is candidate-agnostic,
    * like [[marginAlign]]).
    *
    * Per-pair cosines and the final sum round to 6 decimals (the
    * [[bruteForceTopK]] convention) so the ranking is reproducible
    * across engines. Output: (query_doc, neighbor_doc, maxsim, rank),
    * rank 1..k by (maxsim DESC, neighbor_doc ASC). */
  def maxSimTopK(df: DataFrame, idCol: String, vecCol: String,
      groupSize: Int, panelSize: Int, k: Int): DataFrame = {
    require(groupSize >= 1, "groupSize must be >= 1")
    require(panelSize >= 1 && k >= 1, "panelSize and k must be >= 1")
    val vecs = withNorm(df, idCol, vecCol)
      .withColumn("__doc", expr(s"CAST($idCol AS BIGINT) div $groupSize"))
    val panelDocs = vecs.select(col("__doc")).distinct()
      .withColumn("__h", graft.functions.PortableHash.hash60(col("__doc")))
      .orderBy(col("__h").asc, col("__doc").asc).limit(panelSize)
      .select(col("__doc").as("query_doc"))
    val qv = vecs.join(broadcast(panelDocs), col("__doc") === col("query_doc"))
      .select(col("query_doc"), col(idCol).as("__qtok"),
        col("vec").as("qvec"), col("norm").as("qnorm"))
    val cv = vecs.select(col("__doc").as("neighbor_doc"),
      col("vec").as("cvec"), col("norm").as("cnorm"))
    val scored = cv.join(broadcast(qv), col("query_doc") =!= col("neighbor_doc"))
      .withColumn("__cos", cosineSim(Vectors.dot(col("qvec"), col("cvec")),
        col("qnorm") * col("cnorm")))
    val perQueryVec = scored.groupBy("query_doc", "neighbor_doc", "__qtok")
      .agg(max(col("__cos")).as("__m"))
    val score = perQueryVec.groupBy("query_doc", "neighbor_doc")
      .agg(round(sum(col("__m")), 6).as("maxsim"))
    val w = Window.partitionBy("query_doc")
      .orderBy(col("maxsim").desc, col("neighbor_doc").asc)
    score.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_doc", "neighbor_doc", "maxsim", "rank")
  }

  /** Random-hyperplane signature: `nBits` sign bits of dot(vec, h_i).
    * Hyperplane components are Rademacher ±1 values derived driver-side from
    * a splitmix64-style mix of (bit, component) — reproducible across runs
    * with no stored model, and baked into the plan as array literals so
    * codegen folds them (no per-row hyperplane recomputation). */
  private[graft] def rademacher(b: Int, dim: Int): Seq[Double] =
    Seq.tabulate(dim) { j =>
      var z = b.toLong * 0x9E3779B97F4A7C15L + j.toLong + 1L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign-pattern bucket id from `nBits` hyperplane dots. `seedOffset`
    * selects an independent hyperplane set per LSH table (table t passes
    * t*nBits). The dot against each ±1 hyperplane literal runs through the
    * codegen'd [[Vectors.dot]] expression — the HOF form
    * (aggregate∘zip_with) is CodegenFallback and allocates per row. */
  private def hyperplaneSig(
      vec: org.apache.spark.sql.Column, dim: Int, nBits: Int,
      seedOffset: Int = 0): org.apache.spark.sql.Column = {
    val bits = (0 until nBits).map { b =>
      val dotH = Vectors.dot(vec, typedlit(rademacher(seedOffset + b, dim)))
      when(dotH >= 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** (id, vec, norm, tbl, bucket) relation: each vector exploded into one
    * row per LSH table, bucketed by that table's hyperplane set. */
  private def bucketed(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int, tables: Int): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val base = withNorm(df, idCol, vecCol)
    val sigs = array((0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        hyperplaneSig(col("vec"), dim, nBits, t * nBits).as("bucket"))): _*)
    base
      .withColumn("__tb", explode(sigs))
      .select(col(idCol), col("vec"), col("norm"),
        col("__tb.tbl").as("tbl"), col("__tb.bucket").as("bucket"))
  }

  /** LSH-bucketed approximate top-k: queries score only corpus vectors
    * sharing a sign-pattern bucket in at least one of `tables` independent
    * hyperplane tables (multi-probe: plus, per table, all buckets at
    * Hamming distance 1). Same output shape as [[bruteForceTopK]]; `rank`
    * may have gaps vs exact when a true neighbor hashes far away in every
    * table — that is the documented accuracy trade.
    *
    * The `tables` knob is what decouples recall from bucket size at corpus
    * scale: raising `nBits` alone shrinks buckets (good — candidate lists
    * stay bounded) but craters single-table recall; adding independent
    * tables restores recall at cost linear in `tables` (the same trade the
    * MinHash banding in [[Dedup]] makes). At 100 TB run nBits high enough
    * that 2^nBits ≫ corpus/1000 and tables 4–8; candidate generation stays
    * an equi-join on (tbl, bucket). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, nBits: Int, k: Int,
      tables: Int = 1): DataFrame =
    lshTopKAgainst(df, df, idCol, vecCol, dim, nBits, k, tables)

  /** [[lshTopK]] generalized to distinct QUERY and CORPUS relations: both
    * sides are bucketed by the SAME hyperplane family (the signature of a
    * vector depends only on the vector, so splitting the corpus changes
    * nothing about which buckets collide), queries carry the multi-probe
    * expansion, and candidates are the (tbl, bucket) equi-join — the scale
    * path for asymmetric retrieval (a bounded query stream against a
    * 100 TB corpus index) and for the per-direction legs of
    * [[marginAlign]]. Same output shape and determinism contract as
    * [[bruteForceTopK]], which remains the gated exact oracle tier. */
  def lshTopKAgainst(queries: DataFrame, corpus0: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int, k: Int, tables: Int = 1): DataFrame = {
    // self-index case (lshTopK): query and corpus sides are the SAME
    // bucketed frame — pin it once (eager localCheckpoint) instead of
    // re-running the scan + signature computation per reference
    val qb0 = bucketed(queries, idCol, vecCol, dim, nBits, tables)
    val qb = if (queries eq corpus0) qb0.localCheckpoint() else qb0
    val cb = if (queries eq corpus0) qb
             else bucketed(corpus0, idCol, vecCol, dim, nBits, tables)
    // multi-probe: each query also probes buckets differing in exactly 1 bit
    val probes = qb.select(
      col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"), col("tbl"),
      explode(concat(
        array(col("bucket")),
        array((0 until nBits).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))).as("bucket"))
    val corpus = cb.select(
      col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"),
      col("tbl"), col("bucket"))
    // score BEFORE the pair dedup and project to ids + similarity: the
    // duplicate pairs (same pair colliding in several tables/probes)
    // recompute a dot product each, but the dedup exchange then ships
    // 24-byte rows instead of both vectors per candidate (guide §2.3 —
    // shuffle the proxy, not the payload); cosine_sim is a pure function
    // of the pair, so first-row-wins dedup is value-identical
    val scored = probes.join(corpus, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        cosineSim(Vectors.dot(col("qvec"), col("cvec")), col("qnorm") * col("cnorm")))
      .select("query_id", "neighbor_id", "cosine_sim")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** IVF-style partitioned search with deterministic pseudo-centroids: the
    * `nlist` corpus vectors with the smallest portable hash of their id act
    * as centroids (reproducible, model-free, and — because the hash is the
    * md5-derived [[graft.functions.PortableHash]] family — reproducible by
    * the DuckDB oracle too). Each corpus vector is assigned to its nearest
    * centroid; each query probes the `nprobe` nearest cells. Centroid
    * similarities are rounded to 6 decimals before ranking (ties broken by
    * cell asc) so cell assignment is identical across engines. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    // pinned once (eager localCheckpoint, the shared-leg pattern of the
    // recall harness): `ranked` feeds BOTH the probe side and the
    // assignment side below, and as a plain subplan the whole
    // scan + codebook cross-score + window would execute twice — the
    // r16 measurement was 2.47 s → 1.63 s warm at sf0.1 from this alone
    val ranked = centroidRanked(df, idCol, vecCol, nlist,
      maxRank = math.max(1, nprobe)).localCheckpoint()
    val assigned = ranked.filter(col("__rn") === 1)
      .select(col(idCol).as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"), col("cell"))
    val probed = ranked
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"), col("cell"))
    // no pair dedup: a neighbor lives in exactly ONE cell (assignment is
    // rank 1) and a query probes each cell at most once, so the cell
    // equi-join emits every (query, neighbor) pair at most once — the
    // dropDuplicates this path once carried was a no-op that cost a full
    // exchange + hash aggregate over the candidate pairs (removing it:
    // 1.63 s → 1.25 s warm at sf0.1, results bit-identical)
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim",
        cosineSim(Vectors.dot(col("qvec"), col("cvec")), col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** (id, vec, norm, cell, __rn) — every vector scored against the
    * broadcast pseudo-centroid codebook, keeping its `maxRank` nearest
    * cells (rank 1 = the vector's own cell). Shared by [[ivfTopK]] (probe
    * ranks) and [[semanticNearDupPairs]] (assignment only).
    *
    * Centroids are collected driver-side ONCE (nlist rows — tiny by
    * construction, like any trained IVF codebook) and re-enter the plan as
    * a literal local relation: the assignment and probe joins each
    * reference `centroids`, and leaving it as a subplan would re-execute
    * the scan+sort+limit once per reference. Centroid similarities are
    * rounded to 6 decimals before ranking (ties broken by cell asc) so
    * the cell assignment is identical across engines. */
  private def centroidRanked(
      df: DataFrame, idCol: String, vecCol: String, nlist: Int, maxRank: Int): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
    val centroidRows = base
      .withColumn("__h", graft.functions.PortableHash.hash60(col(idCol)))
      .orderBy("__h").limit(nlist)
      .select(col(idCol).cast("long").as("cell"), col("vec"), col("norm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSeq
    centroidRankedWith(df, idCol, vecCol, centroidRows, maxRank)
  }

  /** [[centroidRanked]] against a CALLER-SUPPLIED codebook — e.g. one
    * trained by [[KMeans.train]] (`(cell, centroid)` pairs; norms are
    * derived here, driver-side, from the handful of codebook rows). */
  private def centroidRankedWith(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Long, Seq[Double], Double)], maxRank: Int): DataFrame = {
    val base = withNorm(df, idCol, vecCol)
    val session = df.sparkSession
    import session.implicits._
    val centroids = codebook.toDF("cell", "centvec", "centnorm")
    val wCells = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cell").asc)
    base.join(broadcast(centroids), lit(true))
      .withColumn("__sim",
        cosineSim(Vectors.dot(col("vec"), col("centvec")), col("norm") * col("centnorm")))
      .withColumn("__rn", row_number().over(wCells))
      .filter(col("__rn") <= maxRank)
      .select(col(idCol), col("vec"), col("norm"), col("cell"), col("__rn"))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * arXiv 2303.09540): assign every vector to its nearest pseudo-centroid
    * cell, then score ONLY within-cell pairs — the all-pairs comparison
    * becomes an equi-join on the cell id, so cost is Σ|cell|², bounded by
    * the codebook size choice (nlist ∝ corpus/target-cell-size), never
    * |corpus|². Pairs whose members straddle a cell boundary are missed —
    * that is SemDeDup's documented recall trade (near-identical vectors
    * share a nearest centroid with overwhelming probability).
    *
    * The assignment subtree feeds both join sides, so Catalyst plans the
    * centroid-scoring pass twice — at production scale materialize the
    * assignment (persist/checkpoint or a staging write) between the two
    * reads; the declarative form here keeps the operator oracle-checkable.
    * Output: (id_a, id_b, cosine_sim), id_a < id_b, cosine ≥ threshold. */
  def semanticNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, threshold: Double): DataFrame =
    withinCellPairs(centroidRanked(df, idCol, vecCol, nlist, maxRank = 1), idCol, threshold)

  /** Within-cell exact-scored pairs over an assignment from
    * [[centroidRanked]]/[[centroidRankedWith]].
    *
    * The assignment is materialized ONCE (`localCheckpoint`) before the
    * self-join: both join sides reference it, and left lazy the whole
    * scan → broadcast-codebook score → rank subtree would be planned and
    * executed twice (same reasoning as Contrastive's pairs and
    * Components' edges). At production scale this is the difference
    * between one and two passes over the full embedding corpus. */
  private def withinCellPairs(assigned0: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val assigned = assigned0
      .select(col(idCol), col("vec"), col("norm"), col("cell"))
      .localCheckpoint()
    val a = assigned.select(
      col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"), col("cell"))
    val b = assigned.select(
      col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"), col("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        cosineSim(Vectors.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** [[semanticNearDupPairs]] with a TRAINED codebook — `(cell, centroid)`
    * rows as produced by [[KMeans.train]] — instead of the hash-sampled
    * pseudo-centroids. Better-fitting cells cut the boundary-straddle
    * recall loss; the plan shape (broadcast codebook, equi-join on cell)
    * is identical. */
  def semanticNearDupPairsWith(
      df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Long, Seq[Double])], threshold: Double): DataFrame = {
    val withNorms = codebook.map { case (cell, c) =>
      (cell, c, math.sqrt(c.map(x => x * x).sum))
    }
    withinCellPairs(
      centroidRankedWith(df, idCol, vecCol, withNorms, maxRank = 1), idCol, threshold)
  }

  /** End-to-end semantic dedup: [[semanticNearDupPairs]] → connected
    * components → keep the minimum-id member of every semantic-duplicate
    * family (the keeper convention used across graft's dedup stack). */
  def semanticDedupKeepers(
      df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, threshold: Double): DataFrame = {
    val pairs = semanticNearDupPairs(df, idCol, vecCol, nlist, threshold)
    val clusters = Components.connectedComponents(
      pairs.select("id_a", "id_b"), "id_a", "id_b")
    val losers = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Scale path for embedding near-dup: LSH-bucketed candidate pairs
    * (same sign-pattern bucket, or differing in exactly one bit via the
    * corpus-side probe expansion), scored exactly, thresholded. Shuffle
    * volume is linear in corpus size; recall loss is bounded by the
    * bucket-collision probability at the chosen `nBits` (cos θ ≥ t pairs
    * agree on a random hyperplane with prob 1 − θ/π). */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int, threshold: Double, tables: Int = 1): DataFrame = {
    val b = bucketed(df, idCol, vecCol, dim, nBits, tables)
    // expand ONE side into Hamming-1 probes so near-boundary pairs meet
    val probes = b.select(
      col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"), col("tbl"),
      explode(concat(
        array(col("bucket")),
        array((0 until nBits).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))).as("bucket"))
    val corpus = b.select(
      col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"),
      col("tbl"), col("bucket"))
    probes.join(corpus, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine_sim", cosineSim(Vectors.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** Margin-based pair mining between two embedding sets — the
    * ratio-margin criterion of margin-based bitext mining (Artetxe &
    * Schwenk, "Margin-based Parallel Corpus Mining with Multilingual
    * Sentence Embeddings", ACL 2019): a candidate pair (x, y) scores
    *
    *   margin(x, y) = cos(x, y) / ((avgTopK_x + avgTopK_y) / 2)
    *
    * which discounts "hub" vectors that are close to everything, and the
    * mined set is the MUTUAL best matches above a margin threshold.
    *
    * This layer takes the two directed top-k score relations as INPUT
    * ((query_id, neighbor_id, cosine_sim, rank) — [[bruteForceTopK]] for
    * the gated oracle tier, [[lshTopK]] per side for the 100 TB path), so
    * candidate generation and margin scoring stay independently chosen.
    * Arithmetic is integer-exact end-to-end for oracle portability: the
    * rounded-6 similarities become e6 integers, per-query neighborhood
    * sums stay integral, and the margin is one truncating int64 division
    *
    *   margin_e6 = (2 · sim_e6 · nA · nB · 1e6) div (sumA_e6·nB + sumB_e6·nA)
    *
    * guarded to positive denominators (a non-positive average
    * neighborhood similarity means the pair sits in a degenerate region —
    * mined bitext needs positive neighborhoods by construction).
    *
    * Scale shape: two groupBy aggregations (one per direction, output =
    * |queries| rows) + equi-joins on the pair ids; never an all-pairs
    * term beyond what the candidate tier already produced.
    *
    * Output: (id_a, id_b, sim_e6, margin_e6), mutual-best pairs with
    * margin_e6 ≥ minMarginE6, ordered ties broken by ids downstream. */
  def marginAlign(ab: DataFrame, ba: DataFrame, minMarginE6: Long): DataFrame = {
    def quantize(df: DataFrame, qa: String, qb: String): DataFrame =
      df.select(col("query_id").as(qa), col("neighbor_id").as(qb),
        floor(col("cosine_sim") * lit(1e6) + lit(0.5)).cast("long").as("sim_e6"),
        col("rank"))
    val abq = quantize(ab, "id_a", "id_b")
    val baq = quantize(ba, "id_b", "id_a")
    // count(sim_e6), not count(*): zero-norm vectors carry NULL sims,
    // which the sum already skips — the average must skip them too
    val aHood = abq.groupBy("id_a")
      .agg(sum("sim_e6").as("sum_a_e6"), count(col("sim_e6")).as("n_a"))
    val bHood = baq.groupBy("id_b")
      .agg(sum("sim_e6").as("sum_b_e6"), count(col("sim_e6")).as("n_b"))
    val abBest = abq.filter(col("rank") === 1).select("id_a", "id_b", "sim_e6")
    val baBest = baq.filter(col("rank") === 1).select(
      col("id_a").as("__ba_a"), col("id_b").as("__ba_b"))
    abBest
      .join(baBest, col("id_a") === col("__ba_a") && col("id_b") === col("__ba_b"))
      .join(aHood, "id_a").join(bHood, "id_b")
      .withColumn("__den", col("sum_a_e6") * col("n_b") + col("sum_b_e6") * col("n_a"))
      .filter(col("__den") > 0)
      .withColumn("margin_e6",
        expr("2 * sim_e6 * n_a * n_b * 1000000 div __den"))
      .filter(col("margin_e6") >= minMarginE6)
      .select("id_a", "id_b", "sim_e6", "margin_e6")
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
      .withColumn("cosine_sim", cosineSim(Vectors.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }
}

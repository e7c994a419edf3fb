package graft.operators

import graft.functions.{PortableHash, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (per-vector min/max) int8 quantization of an embedding column —
  * the standard 4× storage/bandwidth cut for ANN indexes (the IVF*,SQ8
  * family in FAISS and friends): each vector stores two doubles (its own
  * min/max) plus one byte per dimension, and reconstructs as
  * `lo + q/255·(hi−lo)` with error ≤ half a quantization step per
  * coordinate.
  *
  * Everything is per-element IEEE arithmetic — no sums, no transcendentals
  * — so quantized codes are bit-identical on any engine (exactly the
  * property the floating-point aggregates lack) and the operator is fully
  * oracle-checkable. The min/max are projected to attributes BEFORE the
  * per-element lambda (inlining `array_min` into `transform` would
  * re-scan the array per element — same discipline as the tokenize-once
  * rule in the text stack). */
object Quantize {

  /** (id, q_lo, q_hi, qvec) with qvec = int codes 0..255 in input order.
    * Constant vectors (hi == lo) quantize to all-zero codes. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), col("__v"),
        array_min(col("__v")).as("q_lo"), array_max(col("__v")).as("q_hi"))
      .select(col(idCol), col("q_lo"), col("q_hi"),
        when(col("q_hi") === col("q_lo"),
          transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"), x =>
            floor((x - col("q_lo")) / (col("q_hi") - col("q_lo")) * 255.0 + 0.5)
              .cast("int")))
          .as("qvec"))

  /** Inverse mapping for [[int8]]: reconstructed array<double>. Max
    * per-coordinate error is (q_hi − q_lo)/510 (half a step). */
  def dequantInt8(df: DataFrame, qCol: String, loCol: String, hiCol: String): DataFrame =
    df.withColumn("dequant",
      transform(col(qCol), q =>
        col(loCol) + q.cast("double") / 255.0 * (col(hiCol) - col(loCol))))

  // ------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, "Product Quantization
  // for Nearest Neighbor Search", IEEE TPAMI 2011): split each vector
  // into `m` subvectors, quantize each against a per-subspace codebook of
  // `k` codewords → m log2(k) bits per vector (m=8, k=16 → 4 bytes for a
  // 64-dim float vector, 64×). Search uses ADC (asymmetric distance): per
  // query, an m×k lookup table of subspace distances; a corpus vector's
  // approximate distance is m table lookups + a sum — no float math per
  // candidate. This is the compression tier FAISS's IVF*,PQ* indexes run
  // at billion-vector scale.
  //
  // Codebook here = the subvectors of the `k` corpus vectors with the
  // smallest portable hash of their id — the deterministic sampled-init
  // convention shared with ivf_topk/semantic dedup, reproducible by the
  // SQL oracle. A k-means-trained codebook (per-subspace
  // [[KMeans.train]]) drops reconstruction error further; the plan shape
  // downstream is identical (see QuantizeSpec's trained-codebook test).
  //
  // Engine portability: subspace distances quantize to e6 integers at the
  // lookup-table boundary, so codes (argmin of an integer array, ties →
  // lowest codeword) and ADC distances (sums of integers) are exact.
  //
  // Scale shape: the codebook is m·k subvectors (driver-collected like
  // any trained ANN model, re-entering the plan as literals folded into
  // codegen) — encoding is a PURE MAP over the corpus: no join, no
  // shuffle, each vector leaves as m small integers. ADC scoring shuffles
  // only (id, s, code) triples — never raw vectors; the per-query lookup
  // table relation is Q·m·k rows and BROADCASTS for a bounded query
  // batch (the registered query scores corpus-as-queries, the
  // oracle-checkable form, so it joins instead).
  // ------------------------------------------------------------------

  /** Deterministic hash-sampled PQ codebook: (subspace, codeword, subvec)
    * for s in 0..m-1, j in 0..k-1. Driver-side by construction (m·k rows
    * — the model an ANN system would persist). */
  def pqCodebook(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int): Seq[(Int, Int, Seq[Double])] = {
    val rows = df
      .withColumn("__h", PortableHash.hash60(col(idCol)))
      .orderBy(col("__h").asc, col(idCol).asc)
      .limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq)
    require(rows.nonEmpty, "pqCodebook: empty input")
    val dim = rows.head.size
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m=$m")
    val sub = dim / m
    for { s <- 0 until m; j <- rows.indices }
      yield (s, j, rows(j).slice(s * sub, (s + 1) * sub))
  }

  private def subvec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Quantized e6 distance of row-vector subspace `s` to codeword `cw`. */
  private def dE6(v: Column, s: Int, subDim: Int, cw: Seq[Double]): Column =
    floor(Vectors.l2Squared(subvec(v, s, subDim), typedlit(cw)) * lit(1e6) + lit(0.5))
      .cast("long")

  /** PQ codes: (idCol, s, code) — one row per (vector, subspace), `code`
    * the argmin codeword (ties → lowest codeword id). Map-side only: the
    * argmin runs over a literal struct array, no join, no shuffle. */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val byS = codebook.groupBy(_._1)
    val m = byS.size
    val subDim = codebook.head._3.size
    val base = Partitions.widen(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v")), col(idCol))
    val codeStructs = (0 until m).map { s =>
      val pairs = array(byS(s).sortBy(_._2).map { case (_, j, cw) =>
        struct(dE6(col("__v"), s, subDim, cw).as("d"), lit(j).as("j"))
      }: _*)
      // struct ordering is lexicographic (d, then j) → deterministic argmin
      struct(lit(s).as("s"), array_min(pairs).getField("j").cast("int").as("code"))
    }
    base.select(col(idCol), explode(array(codeStructs: _*)).as("__c"))
      .select(col(idCol), col("__c.s").as("s"), col("__c.code").as("code"))
  }

  /** Per-query ADC lookup-table relation: (idCol, s, j, d_e6) — the
    * quantized distance from each query's subspace-`s` subvector to every
    * codeword `j`. Map-side explode, m·k rows per query. */
  def pqQueryDistances(df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val subDim = codebook.head._3.size
    val base = Partitions.widen(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v")), col(idCol))
    val entries = codebook.map { case (s, j, cw) =>
      struct(lit(s).as("s"), lit(j).as("j"), dE6(col("__v"), s, subDim, cw).as("d"))
    }
    base.select(col(idCol), explode(array(entries: _*)).as("__e"))
      .select(col(idCol), col("__e.s").as("s"), col("__e.j").as("j"), col("__e.d").as("d_e6"))
  }

  /** K-means-trained PQ codebook: an independent [[KMeans.train]] per
    * subspace over the sliced corpus (the construction in Jégou et al.
    * §III.A). Same shape as [[pqCodebook]]; lower reconstruction error
    * (QuantizeSpec pins trained ≤ sampled on the test corpus). Training
    * cost is m short k-means runs — each a broadcast-assign + long-form
    * aggregate per iteration, nothing driver-side beyond the k·subDim
    * centroid table. */
  def pqCodebookTrained(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): Seq[(Int, Int, Seq[Double])] = {
    val base = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val dim = base.select(size(col("__v"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"pqCodebookTrained: dim $dim not divisible by m=$m")
    val subDim = dim / m
    (0 until m).flatMap { s =>
      val sliced = base.select(col(idCol), subvec(col("__v"), s, subDim).as("__sv"))
      KMeans.train(sliced, idCol, "__sv", k, iters)
        .select(col("cell"), col("centroid"))
        .collect()
        .map(r => (s, r.getLong(0).toInt, r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
    }
  }

  /** PQ/ADC approximate top-k: every vector queries the PQ-coded corpus
    * (self excluded). Output: (query_id, neighbor_id, dist_e6, rank),
    * rank 1..k by (ADC distance asc, neighbor asc). */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      m: Int, codebookK: Int, k: Int): DataFrame =
    pqTopKWith(df, idCol, vecCol, pqCodebook(df, idCol, vecCol, m, codebookK), k)

  // ------------------------------------------------------------------
  // IVF + PQ with residual encoding — the composition FAISS ships as
  // `IVFx,PQy` and runs at billion-vector scale (Jégou et al. §IV: coarse
  // quantizer partitions the space; PQ encodes the RESIDUAL vec − centroid,
  // whose energy is far lower than the raw vector's, so the same code
  // budget buys much finer resolution). Search probes `nprobe` cells; the
  // query's residual — and therefore its ADC lookup table — is computed
  // PER PROBED CELL, and a candidate is scored only through its own cell's
  // table.
  //
  // Scale shape: candidates come from an equi-join on (cell, subspace,
  // codeword) — a vector participates only where its cell is probed, the
  // IVF pruning. Raw vectors appear in exactly two map-side passes
  // (assignment, residual encode); everything downstream moves (id, cell,
  // s, code) integers. Both codebooks are driver-held literals (the
  // persisted index model); the per-query table is nprobe·m·k rows.
  // ------------------------------------------------------------------

  /** Coarse codebook: the `nlist` vectors with the smallest portable hash
    * (deterministic sampled init, same rule as every graft codebook).
    * Returns (cell = rank 0.., centroid). */
  def coarseCodebook(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Seq[(Int, Seq[Double])] =
    df.withColumn("__h", PortableHash.hash60(col(idCol)))
      .orderBy(col("__h").asc, col(idCol).asc)
      .limit(nlist)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toIndexedSeq: Seq[Double]) }

  /** Driver-side mirror of the engine's quantized L2² (sequential fold,
    * identical operand order to [[graft.functions.expressions.L2Squared]]). */
  private def dE6Driver(a: Seq[Double], b: Seq[Double]): Long = {
    var s = 0.0; var i = 0
    while (i < math.min(a.size, b.size)) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.floor(s * 1e6 + 0.5).toLong
  }

  /** IVF+PQ/ADC approximate top-k over residual codes. Every vector
    * queries the index (self excluded); candidates are vectors whose
    * assigned cell is among the query's `nprobe` nearest. Output shape =
    * [[pqTopK]]. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, nprobe: Int, m: Int, codebookK: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val coarse = coarseCodebook(df, idCol, vecCol, nlist)

    val base = Partitions.widen(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v")), col(idCol))
    // (cell-distance, cell) structs sorted lexicographically = rank by
    // (d_e6 asc, cell asc); argmin = head, probes = first nprobe
    val cellDists = array_sort(array(coarse.map { case (cell, cv) =>
      struct(floor(Vectors.l2Squared(col("__v"), typedlit(cv)) * lit(1e6) + lit(0.5))
        .cast("long").as("d"), lit(cell).as("cell"))
    }: _*))
    // pinned once (eager localCheckpoint): `withCells` feeds both the
    // corpus-assignment side and the probe side, and as a plain subplan
    // the full N × nlist coarse-quantizer scoring would execute once per
    // reference (same dual-reference shape, and fix, as ivfTopK)
    val withCells = base.withColumn("__cells", cellDists).localCheckpoint()

    val centroids = coarse.toDF("cell", "__cent")
    // corpus side: assigned cell + residual
    val assigned = withCells
      .select(col(idCol), col("__v"), col("__cells").getItem(0).getField("cell").as("cell"))
      .join(broadcast(centroids), Seq("cell"))
      .select(col(idCol), col("cell"),
        zip_with(col("__v"), col("__cent"), (a, b) => a - b).as("__r"))

    // residual PQ codebook: hash-sampled rows, assignment + residual done
    // driver-side with the identical quantized metric
    val sampled = df.withColumn("__h", PortableHash.hash60(col(idCol)))
      .orderBy(col("__h").asc, col(idCol).asc)
      .limit(codebookK)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq)
    val resRows = sampled.map { v =>
      val best = coarse.minBy { case (cell, cv) => (dE6Driver(v, cv), cell) }
      v.zip(best._2).map { case (a, b) => a - b }: Seq[Double]
    }
    require(resRows.nonEmpty, "ivfPqTopK: empty input")
    val dim = resRows.head.size
    require(dim % m == 0, s"ivfPqTopK: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val resCb = for { s <- 0 until m; j <- resRows.indices }
      yield (s, j, resRows(j).slice(s * subDim, (s + 1) * subDim))

    // per-vector code ARRAY (m small ints) — the PQ point: codes are tiny
    // and ALWAYS broadcastable, so the pair join below is a BHJ on cell
    val codesArr = pqCodes(assigned.select(col(idCol), col("__r")), idCol, "__r", resCb)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("s"), col("code")))).as("__sc"))
      .select(col(idCol).as("neighbor_id"),
        transform(col("__sc"), e => e.getField("code")).as("__codes"))
      .join(assigned.select(col(idCol).as("neighbor_id"), col("cell")), Seq("neighbor_id"))

    // query side: one residual — and one ADC TABLE (m×k quantized
    // distances as a nested array literal-expression) — PER PROBED CELL.
    // The per-pair distance is then an m-term array LOOKUP fold, so the
    // join emits ONE row per (query, candidate) instead of one per
    // (pair, subspace): m× less data through join+aggregation (measured
    // 4.7 s → 3.7 s warm at sf0.1 vs the exploded (cell,s,j) sort-merge
    // form; the residue is ADC-table compute, which is the operator).
    val probes = withCells
      .select(col(idCol).as("query_id"),  col("__v"),
        explode(slice(col("__cells"), 1, nprobe)).as("__pc"))
      .select(col("query_id"), col("__v"), col("__pc").getField("cell").as("cell"))
      .join(broadcast(centroids), Seq("cell"))
      .select(col("query_id"), col("cell"),
        zip_with(col("__v"), col("__cent"), (a, b) => a - b).as("__qr"))
    val byS = resCb.groupBy(_._1)
    val adcTable = array((0 until m).map { s =>
      val row = byS(s).sortBy(_._2)
      array(row.map { case (_, _, cw) => dE6(col("__qr"), s, subDim, cw) }: _*)
    }: _*)
    val qAdc = probes.select(col("query_id"), col("cell"), adcTable.as("__adc"))

    val adc = qAdc.join(broadcast(codesArr), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("__adc"), col("__codes"), (row, cj) => element_at(row, cj + 1)),
          lit(0L), (acc, x) => acc + x).as("dist_e6"))
    val w = Window.partitionBy("query_id").orderBy(col("dist_e6").asc, col("neighbor_id").asc)
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist_e6", "rank")
  }

  /** [[pqTopK]] against a caller-supplied codebook (e.g. from
    * [[pqCodebookTrained]]). */
  def pqTopKWith(df: DataFrame, idCol: String, vecCol: String,
      cb: Seq[(Int, Int, Seq[Double])], k: Int): DataFrame = {
    val codes = pqCodes(df, idCol, vecCol, cb)
      .select(col(idCol).as("neighbor_id"), col("s"), col("code").as("j"))
    val qdist = pqQueryDistances(df, idCol, vecCol, cb)
      .select(col(idCol).as("query_id"), col("s"), col("j"), col("d_e6"))
    val adc = codes.join(qdist, Seq("s", "j"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d_e6")).as("dist_e6"))
    val w = Window.partitionBy("query_id").orderBy(col("dist_e6").asc, col("neighbor_id").asc)
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist_e6", "rank")
  }

  /** Johnson-Lindenstrauss random projection, exact-integer form: project
    * `dim`-d embeddings onto `k` Rademacher (±1) directions — the
    * cheapest JL map (Achlioptas 2003: ±1 entries satisfy the lemma with
    * the same distortion bound as Gaussians, and the dot products are
    * additions). Components first quantize to e6 integers, so every
    * projection p_i = Σ x_e6·(±1) and both squared norms are EXACT int64
    * sums — order-independent, hash-matchable on any engine — and the JL
    * estimator ‖p‖²/k (whose expectation is ‖x‖²) comes out as one
    * integer floor division. The per-vector `ratio_e6` column is the
    * operator's self-audit: how much this particular vector's norm
    * distorts under the map (concentrates near 1e6 as k grows — the
    * lemma), which is the number that decides k before an ANN/clustering
    * pipeline switches to projected vectors. The directions are baked as
    * array literals from the same splitmix generator as the LSH
    * hyperplanes (seed block 1000+) — no stored model, codegen folds
    * them.
    *
    * Scale shape: map-only (0 exchanges) — k codegen'd dot products per
    * row; output is k+2 numbers per vector, an 8×/`dim/k` compression
    * before any distance-based downstream. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k >= 1 && dim >= 1, "dim and k must be >= 1")
    val dirs = (0 until k).map(i => Similarity.rademacher(1000 + i, dim))
    val xe6 = expr(s"transform($vecCol, x -> " +
      "CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))")
      .cast("array<double>")
    val base = df.select(col(idCol), xe6.as("__xe6"))
    // e6-valued doubles stay integer-exact: |x_e6| ≤ ~4e6, dot sums ≤
    // ~2.6e8 ≪ 2^53; squares move to int64 BEFORE summing (p² ≤ ~7e16
    // exceeds double's exact-integer range but not long's)
    val pCols = dirs.zipWithIndex.map { case (h, i) =>
      Vectors.dot(col("__xe6"), typedlit(h)).cast("long").as(s"__p$i")
    }
    val projected = base.select(col(idCol) +: Vectors.dot(col("__xe6"), col("__xe6"))
      .cast("long").as("norm_sq_e12") +: pCols: _*)
    val sumSq = (0 until k).map(i => s"__p$i * __p$i").mkString(" + ")
    projected
      .withColumn("est_sq_e12", expr(s"($sumSq) div $k"))
      .withColumn("ratio_e6",
        when(col("norm_sq_e12") > 0,
          floor(col("est_sq_e12") * lit(1.0) / col("norm_sq_e12") * lit(1000000.0)
            + lit(0.5)).cast("long")))
      .select(col(idCol), col("norm_sq_e12"), col("est_sq_e12"), col("ratio_e6"))
  }

  /** Sign-bit (1-bit) binary quantization: bit i of the code is 1 iff
    * `vec[i] > 0` — the degenerate no-rotation case of the
    * random-hyperplane family (Charikar, STOC '02) and the "binary
    * quantization" serving tier modern vector stores ship as their
    * 32× compression / fastest-distance option. Codes pack into 32-bit
    * words inside longs (bit 63 is unused on purpose: engines whose
    * BIGINT shift traps on `1 << 63` — DuckDB among them — must be able
    * to mirror the packing bit-exactly, the portable-hash discipline
    * applied to bit layout). Output: (id, bcode array<bigint> of
    * ceil(dim/32) words). Map-only, codegen'd, 0 exchanges. */
  def binarize(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val words = (dim + 31) / 32
    df.select(col(idCol), col(vecCol).as("__v"))
      .select(col(idCol), expr(
        s"transform(sequence(0, ${words - 1}), w -> " +
          "aggregate(sequence(0, 31), 0L, (acc, j) -> " +
          s"IF(w * 32 + j < $dim AND element_at(__v, w * 32 + j + 1) > 0, " +
          "acc + shiftleft(1L, j), acc)))").as("bcode"))
  }

  /** Hamming top-k over [[binarize]] codes for the hash-sampled query
    * panel — the binary-quantization serving path: distance is
    * `Σ_w popcount(xor)` over the packed words (integer-exact, so the
    * whole ranking is oracle-checkable), the panel broadcasts, and the
    * corpus streams once. Rank 1..k by (hamming ASC, neighbor_id ASC).
    * At 100 TB this is the cheapest ANN tier in the repo: 8 bytes per
    * 64-dim vector cross the wire instead of 256, and the distance
    * kernel is two XOR+POPCNTs. */
  def binaryTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      panelSize: Int, k: Int): DataFrame = {
    require(panelSize >= 1 && k >= 1, "panelSize and k must be >= 1")
    val codes = binarize(df, idCol, vecCol, dim)
    val panel = codes
      .withColumn("__h", graft.functions.PortableHash.hash60(col(idCol)))
      .orderBy(col("__h").asc, col(idCol).asc).limit(panelSize)
      .select(col(idCol).as("query_id"), col("bcode").as("qcode"))
    val corpus = codes.select(col(idCol).as("neighbor_id"), col("bcode").as("ccode"))
    val scored = corpus.join(broadcast(panel), col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(qcode, ccode, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
          "0L, (acc, v) -> acc + v)"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "hamming", "rank")
  }
}

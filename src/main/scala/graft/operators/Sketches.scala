package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL, via Spark's
  * built-in `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * At 100 TB, exact `countDistinct` of a high-cardinality column costs a
  * full shuffle of every distinct value; an HLL sketch is a fixed-size
  * state (KBs) with bounded relative error, and — the property this module
  * exists for — sketches MERGE: the sketch of a union is computable from
  * the sketches of the parts. That makes approximate distinct counts
  * compatible with [[Incremental]]-style snapshot maintenance (store a
  * sketch per key per day; any rollup is a union of sketches, never a
  * rescan) and with map-side partial aggregation (Spark merges the same
  * way internally).
  *
  * Determinism caveat (measured, not just theoretical): dense HLL register
  * state is a per-register max and thus merge-order independent, but
  * DataSketches promotes sparse (LIST/SET) sketches to dense at
  * merge-path-dependent points, so estimates may differ by a few counts
  * across partition layouts or merge trees. The guaranteed property — what
  * the spec asserts — is that every path's estimate stays within the
  * configured error bound of the exact count. Consequently no DuckDB
  * oracle is registered for sketch queries (DuckDB's approx_count_distinct
  * is a different HLL with different registers; cross-engine hash-matching
  * is impossible by construction) and sketch columns must not feed
  * hash-compared outputs.
  */
object Sketches {

  /** Per-key HLL sketch of `valueCol` (lgConfigK 12 ≈ 2.2% rel. error). */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Merge sketch snapshots (same shape as [[Incremental.merge]]). */
  def mergeSketches(snapshots: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "nothing to merge")
    snapshots.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
  }

  /** Read the estimate off a sketch snapshot. */
  def withEstimate(snapshot: DataFrame): DataFrame =
    snapshot.withColumn("n_distinct_est", hll_sketch_estimate(col("sketch")))

  /** Per-key approximate percentiles via Spark's `percentile_approx`
    * (Greenwald–Khanna style quantile summaries): the third sketch family
    * after distinct-count (HLL) and frequency (CMS). The summary is
    * fixed-size state that Spark merges map-side like any partial
    * aggregate, so the full value set never shuffles — exact per-group
    * `percentile` sorts every group's values through the exchange, which
    * is the cost this avoids at 100 TB. Guarantee: each returned value's
    * RANK error is bounded by n/accuracy (so accuracy=10000 → ±0.01% of
    * rows), spec-asserted against exact percentiles and under
    * repartitioning. Same no-oracle policy as HLL: summaries are
    * merge-path-dependent within the rank bound, so estimates must not
    * feed hash-compared outputs. */
  def quantileSummary(df: DataFrame, keys: Seq[String], valueCol: String,
      percentages: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(
        col(valueCol),
        array(percentages.map(lit): _*),
        lit(accuracy)).as("quantiles_approx"))

  /** Engine-portable HLL-shape distinct estimate — the oracle-checkable
    * member of the sketch family. Registers derive from the md5-based
    * [[graft.functions.PortableHash.hash60]]: the top `p` bits pick the
    * bucket, the rank is the leading-zero count of the remaining
    * `60 − p` bits + 1 (Flajolet et al. 2007), the per-bucket max is an
    * order-independent aggregate, and the register sum
    * Σ 2^(53 − M_j) is an exact int64 (every term a whole power of two,
    * empty buckets contribute 2⁵³). The only floating-point step is the
    * final `C / S` division against a shared literal constant
    * C = α_m·m²·2⁵³, so the estimate is bit-identical on any engine —
    * unlike the DataSketches tier above, which stays for production use
    * (better constants, sparse modes, small/large-range corrections).
    *
    * No small-range (linear-counting) correction: callers must sit in
    * the raw-estimate regime (cardinality ≳ 2.5·2^p), where the plain
    * estimator's error is the standard 1.04/√m. The spec pins accuracy
    * against exact counts; the registered query keeps all SFs above the
    * threshold by sketching `event_id`.
    *
    * Output: keys + (n_est long). One shuffle on (keys, bucket) with
    * map-side max partials, then one on keys — value strings never
    * shuffle, register state is ≤ 2^p rows per key. */
  def portableDistinctEstimate(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, keys, valueCol, p), keys, p)

  /** SPARSE per-key HLL registers of the portable family: keys + (__b
    * bucket, __m max-rank) — one row per OCCUPIED bucket. Separated from
    * [[portableDistinctEstimate]] so registers can be STORED and MERGED
    * before estimation (per-day snapshots, rolling windows): register
    * merge is `max(__m)` per (keys, __b) — order-independent, exact. */
  def hllRegisters(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val tailBits = 60 - p
    val h = graft.functions.PortableHash.hash60(col(valueCol))
    // exact integer arithmetic: Spark's `/` is DOUBLE division, and hash60
    // values reach 2^60 > 2^53, so a hash within rounding distance of a
    // multiple of 2^tailBits could land in the wrong bucket vs the oracle's
    // integer `//`. h is non-negative, so shiftright IS floor division.
    val bucket = shiftright(h, tailBits)
    val r = h % lit(1L << tailBits)
    // rank = leading zeros of the tail + 1 = tailBits + 1 - bitLength(r);
    // bitLength via a literal threshold cascade (codegen'd CASE chain —
    // no libm, no loop)
    // fold from k=0 up so the LARGEST threshold lands outermost in the
    // final when-chain (the cascade must test 2^51 before 2^0)
    val rank = (0 until tailBits).foldLeft(lit(tailBits + 1)) {
      case (elseExpr, k) => when(r >= lit(1L << k), lit(tailBits - k)).otherwise(elseExpr)
    }
    val kcols = keys.map(col)
    df.select(kcols :+ bucket.as("__b") :+ rank.as("__rank"): _*)
      .groupBy(kcols :+ col("__b"): _*)
      .agg(max(col("__rank")).as("__m"))
  }

  /** Estimate from SPARSE registers (absent buckets count as empty) —
    * the read side of [[hllRegisters]], tolerating any amount of max-
    * merging in between. */
  def hllEstimate(registers: DataFrame, keys: Seq[String], p: Int = 8): DataFrame = {
    val m = 1 << p
    val c = Sketches.alphaConstant(m)
    val kcols = keys.map(col)
    registers
      .groupBy(kcols: _*)
      .agg(
        // integer shift, not pow(): zero libm in the register sum
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - __m AS INT))")).as("__s_present"),
        count(lit(1)).as("__n_buckets"))
      .withColumn("__s",
        col("__s_present") + (lit(m.toLong) - col("__n_buckets")) * lit(1L << 53))
      .withColumn("n_est",
        floor(lit(c) / col("__s") + lit(0.5)).cast("long"))
      .drop("__s_present", "__n_buckets", "__s")
  }

  /** α_m·m²·2⁵³ — the numerator constant of the raw HLL estimate, shared
    * verbatim with the SQL oracle so the single double division matches
    * bit-for-bit. */
  def alphaConstant(m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * math.pow(2.0, 53)
  }

  /** Fixed-boundary histogram partials — the engine-portable, MERGEABLE
    * member of the quantile family (the HLL-recipe applied to
    * percentiles: exact integer state, one shared-constant rule, so any
    * engine reproduces it bit-for-bit). Bucket boundaries are a FIXED
    * rule of the value (`trunc(value) div width` — truncating division,
    * identical in Spark's `div` and DuckDB's `//`), never data-dependent,
    * which is what makes the state mergeable by plain count addition:
    * the merged histogram of parts IS the whole-input histogram, exactly,
    * independent of partitioning or merge order — the property
    * Greenwald-Khanna/KLL summaries only have within a rank bound. The
    * cost of fixed boundaries is a VALUE-error bound (≤ `width`) instead
    * of a rank-error bound; choose `width` from domain knowledge exactly
    * like a t-digest's compression parameter.
    *
    * State per key: one row per OCCUPIED bucket (≤ value-range/width),
    * map-side combined; raw values never shuffle. Store partials per
    * snapshot day ([[Incremental]]-style) and any rollup is
    * [[mergeHistograms]] + [[quantilesFromHistogram]] — never a rescan. */
  def histogramPartials(df: DataFrame, keys: Seq[String], valueCol: String,
      width: Long): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    val bucket = expr(s"CAST(floor(`$valueCol`) AS BIGINT) div $width").as("bucket")
    df.groupBy(keys.map(col) :+ bucket: _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge histogram snapshots: count addition (exact, order-free). */
  def mergeHistograms(snapshots: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "nothing to merge")
    snapshots.reduce(_ unionByName _)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Read quantiles off a merged histogram: for each percentile q (e6),
    * the LOWER EDGE of the smallest bucket whose cumulative count reaches
    * rank ⌈q·total⌉ — the standard lower-quantile definition, so the true
    * percentile value v satisfies estimate ≤ v < estimate + width
    * (spec-asserted). All integer arithmetic: the rank comparison is
    * `cum·10⁶ ≥ total·q_e6` (exact int64 up to ~9.2·10¹² rows per key —
    * beyond that, pre-divide q_e6's trailing zeros), so the emitted
    * values are bit-identical on any engine.
    *
    * `percentiles` maps output column name → q in e6 (500000 = median).
    * Plan shape: the two windows and the final groupBy all partition by
    * `keys`, so they ride ONE exchange after the partials' shuffle. */
  def quantilesFromHistogram(hist: DataFrame, keys: Seq[String], width: Long,
      percentiles: Seq[(String, Long)]): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    require(percentiles.forall { case (_, q) => q >= 0 && q <= 1000000 },
      "percentiles are e6 values in [0, 1000000]")
    val part = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val cumW = part.orderBy(col("bucket"))
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(cumW))
      .withColumn("__total", sum(col("n")).over(part))
    val aggs = percentiles.map { case (name, qE6) =>
      min(when(col("__cum") * lit(1000000L) >= col("__total") * lit(qE6),
        col("bucket"))).as(s"__b_$name")
    }
    cum.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(col) ++ percentiles.map { case (name, _) =>
        (col(s"__b_$name") * lit(width)).as(name)
      }: _*)
  }

  /** One-shot convenience: partials → quantiles. */
  def histogramQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
      width: Long, percentiles: Seq[(String, Long)]): DataFrame =
    quantilesFromHistogram(histogramPartials(df, keys, valueCol, width),
      keys, width, percentiles)

  /** Engine-portable Count-Min frequency registers — the FREQUENCY member
    * of the portable sketch trio (HLL → distinct counts, fixed-boundary
    * histogram → quantiles, this → per-key frequency), built by the same
    * recipe: exact integer state from the md5-based
    * [[graft.functions.PortableHash]], no data-dependent constants, so
    * registers and estimates are bit-identical on any engine. Row `j` of
    * `depth` uses the seeded hash (input prefixed `"j:"`) — an
    * independent function per row, the pairwise-independence Count-Min
    * needs (Cormode & Muthukrishnan 2005). Register (j, bucket) counts
    * occurrences EXACTLY, so snapshot merging is plain count addition and
    * the merged estimate equals the whole-input estimate — the exact
    * merge law of the histogram sketch, not the bounded drift of the
    * DataSketches tier ([[countMin]] stays for production: wider widths,
    * serialized form, conservative constants).
    *
    * State: ≤ depth·width rows, map-side combined — raw keys never
    * shuffle, only (j, bucket) pairs. */
  def cmsPartials(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val k = col(valueCol)
    val buckets = array((0 until depth).map(j =>
      graft.functions.PortableHash.hash60(k, j) % lit(width.toLong)): _*)
    df.select(posexplode(buckets).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Merge CMS register snapshots: count addition (exact, order-free). */
  def mergeCms(snapshots: Seq[DataFrame]): DataFrame = {
    require(snapshots.nonEmpty, "nothing to merge")
    snapshots.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum(col("n")).as("n"))
  }

  /** Point frequency estimates off merged registers for a bounded
    * candidate relation: each candidate key reads its `depth` registers
    * (empty register → 0) and takes the min. Guarantee: true ≤ est, and
    * est ≤ true + εN with probability ≥ 1 − δ, ε = e/width, δ = e^−depth.
    * All integer arithmetic — estimates hash-match across engines.
    * Output: candidates' `keyCol` + `n_est`. */
  def cmsEstimate(registers: DataFrame, candidates: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val buckets = array((0 until depth).map(j =>
      graft.functions.PortableHash.hash60(col(keyCol), j) % lit(width.toLong)): _*)
    candidates
      .select(col(keyCol), posexplode(buckets).as(Seq("j", "bucket")))
      .join(registers, Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }

  /** CMS inner product — the sketch estimate of an equi-JOIN SIZE
    * (Alon-Matias-Szegedy F₂/join-size line; Cormode & Muthukrishnan §4.2):
    * for two frequency vectors a, b over the same key domain,
    * |A ⋈ B| = Σ_k a(k)·b(k), and the CMS estimate is
    * min_j Σ_bucket regsA[j]·regsB[j] — an overestimate only (hash
    * collisions add mass, never remove it), within ε·‖a‖₁‖b‖₁ with
    * probability 1−δ. This is the cardinality-estimation primitive a
    * cost-based planner uses to pick join order/strategy WITHOUT
    * touching the data: per-relation sketches are tiny (depth×width
    * integers), mergeable across shards, and the estimate is one
    * sketch-sized join. Exact integer arithmetic end-to-end — the same
    * portability contract as [[cmsPartials]], so an oracle reproduces
    * the estimate bit-for-bit.
    *
    * Input: two register relations from [[cmsPartials]] built with the
    * SAME (depth, width). Output: one row (n_est long). */
  def cmsInnerProduct(regsA: DataFrame, regsB: DataFrame): DataFrame =
    regsA.select(col("j"), col("bucket"), col("n").as("__na"))
      .join(regsB.select(col("j"), col("bucket"), col("n").as("__nb")),
        Seq("j", "bucket"))
      .groupBy("j").agg(sum(col("__na") * col("__nb")).as("__dot"))
      .agg(min(col("__dot")).as("n_est"))

  /** KMV (k minimum values) set sketch — the engine-portable DISTINCT/
    * SIMILARITY member of the sketch family (Bar-Yossef et al. 2002; the
    * theta-sketch ancestor). The sketch of a set is its `k` smallest
    * DISTINCT [[graft.functions.PortableHash.hash60]] values: a fully
    * deterministic function of the set, so unlike the DataSketches tier
    * above it hash-matches on any engine, and it is trivially mergeable —
    * the sketch of a union is the k smallest of the sketches' union
    * (how [[kmvJaccardPairs]] builds its pair estimates).
    *
    * Output: (setCol, __h, one row per retained hash, ≤ k per set).
    * Scale shape: one distinct over (set, hash60) — the only shuffle
    * carrying data — then a per-set ranking window over ≤ |distinct
    * values| rows. Raw values leave the map side only as 60-bit hashes. */
  def kmvSketch(df: DataFrame, setCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sketch size k must be >= 1, got $k")
    val hs = df
      .filter(col(setCol).isNotNull && col(valueCol).isNotNull)
      .select(col(setCol), graft.functions.PortableHash.hash60(col(valueCol)).as("__h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(setCol).orderBy(col("__h").asc)
    hs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Pairwise Jaccard estimates between KMV-sketched sets: for each set
    * pair, merge the two sketches (k smallest distinct hashes of the
    * union) and count how many of those union-sketch members appear in
    * BOTH sketches — n_both/n_sketch is the standard KMV Jaccard
    * estimator (±1/√k), computed here entirely in exact integers so the
    * estimate itself is oracle-reproducible.
    *
    * The pair domain is collected driver-side as a bounded literal (the
    * IVF-codebook / Bradley-Terry discipline: `require` on the domain
    * size BEFORE the collect), so the per-pair union never needs a
    * non-equi join — sketch rows equi-join the pair list on the set id.
    * Cost: |pairs| · 2k rows through one agg + one window; the sets
    * themselves were already reduced to ≤ k hashes each by
    * [[kmvSketch]], so this step is independent of data size.
    *
    * Output: (set_a, set_b, n_sketch, n_both, jaccard_est_e6) for every
    * unordered set pair. */
  def kmvJaccardPairs(sketch: DataFrame, setCol: String, k: Int,
      maxSets: Int = 1000): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val ids = sketch.select(col(setCol).cast("string").as("s")).distinct()
    val n = ids.limit(maxSets + 1).count()
    require(n <= maxSets,
      s"kmvJaccardPairs pair domain has > $maxSets sets — the pair list is " +
        "driver-held; raise maxSets only for genuinely bounded domains")
    val setIds = ids.as[String].collect().sorted
    val pairs = (for {
      i <- setIds.indices; j <- (i + 1) until setIds.length
    } yield (setIds(i), setIds(j))).toSeq.toDF("set_a", "set_b")
    val sk = sketch.select(col(setCol).cast("string").as("s"), col("__h"))
    val rows = pairs.join(sk, col("set_a") === col("s"))
      .select(col("set_a"), col("set_b"), col("__h"),
        lit(1).as("__ina"), lit(0).as("__inb"))
      .unionByName(pairs.join(sk, col("set_b") === col("s"))
        .select(col("set_a"), col("set_b"), col("__h"),
          lit(0).as("__ina"), lit(1).as("__inb")))
    // union-sketch: distinct hashes with membership flags, k smallest
    val merged = rows.groupBy("set_a", "set_b", "__h")
      .agg(max(col("__ina")).as("__ina"), max(col("__inb")).as("__inb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("set_a", "set_b").orderBy(col("__h").asc)
    merged.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .groupBy("set_a", "set_b")
      .agg(count(lit(1)).as("n_sketch"),
        sum((col("__ina") * col("__inb")).cast("long")).as("n_both"))
      // exact-integer numerator ≤ k·1e6 — double division of exactly-
      // representable int64s + floor(x+0.5), identical on any engine
      .withColumn("jaccard_est_e6",
        floor(col("n_both") * lit(1000000L) / col("n_sketch") + lit(0.5)).cast("long"))
  }

  /** Count-Min sketch of `valueCol`'s frequency distribution — approximate
    * heavy-hitters over streams/shards too hot to count exactly. The
    * sketch aggregates distributed (Spark's codegen `count_min_sketch`
    * aggregate), and only the fixed-size counter array reaches the driver.
    * Unlike HLL's promotion states, CMS is a plain counter matrix: merging
    * is elementwise addition, so merged estimates are EXACTLY the
    * whole-input estimates, independent of partitioning or merge order
    * (asserted in spec). Estimates overcount only: true ≤ est ≤ true+εN
    * with probability ≥ confidence (Cormode & Muthukrishnan 2005). */
  def countMin(df: DataFrame, valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42)
      : org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = df.select(
        count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
          .as("cms"))
      .head().getAs[Array[Byte]]("cms")
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }
}

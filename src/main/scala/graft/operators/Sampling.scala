package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * All decisions derive from `md5(key)` — NOT `rand()` — so:
  *  - results are identical run-to-run, across cluster sizes, and across
  *    engines (the DuckDB oracles compute the same buckets);
  *  - a document keeps its sample/split assignment as the corpus grows
  *    (critical for train/val/test hygiene: re-running the pipeline on an
  *    appended corpus never moves an old doc from val into train);
  *  - no shuffle, no state: pure per-row projection, fully codegen'd.
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 24 bits of md5(key) mod buckets. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    (conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long") % buckets)
      .as("bucket")

  /** Keep a deterministic ~`fraction` of rows, keyed by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hashBucket(col(keyCol), buckets) < (fraction * buckets).toLong)
  }

  /** Assign each row a named split by hash range, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`. Fractions must
    * sum to 1 (±1e-9); ranges are cumulative and stable. */
  def splitColumn(key: Column, splits: Seq[(String, Double)], buckets: Int = 10000): Column = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val b = hashBucket(key, buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => (c * buckets).toLong)
    splits.map(_._1).zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, cut)) =>
        when(b < cut, lit(name)).otherwise(acc)
      }
  }

  /** Stratified deterministic sample: per-class keep fractions (classes
    * absent from the map use `defaultFraction`). The class column only
    * selects the threshold — assignment still depends on the key hash
    * alone. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, classCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    val threshold = fractions.foldLeft(lit((defaultFraction * buckets).toLong)) {
      case (acc, (cls, f)) =>
        when(col(classCol) === cls, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets) < threshold)
  }

  /** Per-group quota: keep the top `quotas(group)` rows by `scoreCol`
    * descending (ties broken by `keyCol` ascending — fully deterministic),
    * groups absent from the map use `defaultQuota`. The domain-capping
    * primitive of corpus assembly ("at most N docs per source/domain, best
    * first"): bounds any single domain's contribution regardless of its
    * raw size, where a fraction-based sample would still let a huge domain
    * dominate. row_number ranking gets WindowGroupLimit pushdown — each
    * partition retains only its running top quota before the final sort,
    * so the shuffle carries candidates, not the domain's full row set. */
  /** Deterministic mixture rebalancing: downsample every group toward the
    * balanced target `T = total div #groups`, so each group keeps an
    * expected `min(n_g, T)` rows — the "flatten the source distribution"
    * step of corpus mixing (small sources survive whole; dominant sources
    * are thinned to an equal share). Acceptance is per-row from the 60-bit
    * portable hash (`hash(key) mod n_g < T`), so decisions are
    * reproducible across runs, engines, and cluster layouts. Group stats
    * are one row per group, computed by a tiny aggregate and broadcast
    * back — no extra shuffle of the data itself. */
  def balancedSample(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val wAll = Window.partitionBy(lit(0))
    val stats = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__total", sum("__n").over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__tgt", least(col("__n"), expr("__total div __k")))
      .select(col(groupCol), col("__n"), col("__tgt"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(pmod(graft.functions.PortableHash.hash60(col(keyCol)), col("__n")) < col("__tgt"))
      .drop("__n", "__tgt")
  }

  /** [[balancedSample]] generalized to explicit target shares: group `g`
    * keeps `min(n_g, floor(total · weights(g)))` rows in expectation
    * (groups absent from the map keep everything). The corpus-mixing dial:
    * "40% web, 20% books, …" as one deterministic pass. */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1), "weights must be in [0,1]")
    val wAll = Window.partitionBy(lit(0))
    val weightCol = weights.foldLeft(lit(1.0)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val stats = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__tgt",
        least(col("__n"), floor(sum("__n").over(wAll) * weightCol).cast("long")))
      .select(col(groupCol), col("__n"), col("__tgt"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(pmod(graft.functions.PortableHash.hash60(col(keyCol)), col("__n")) < col("__tgt"))
      .drop("__n", "__tgt")
  }

  /** Temperature-flattened resampling — the multilingual mixing recipe
    * (share ∝ n^α, α < 1 upsamples the tail relative to the head; the
    * `p_l ∝ |D_l|^α` rule of multilingual pretraining, e.g. XLM-R,
    * Conneau et al. 2020): resample to ~`totalRows` rows with group g
    * keeping min(n_g, ⌊totalRows · n_g^α / Σ n^α⌋).
    *
    * Portability: each group's n^α is quantized to e6 integers before the
    * cross-group sum (float-sum order never reaches the comparison; same
    * discipline as every ln in graft), and acceptance is the exact-integer
    * `hash mod n < tgt` shared by the whole sampling family.
    *
    * Scale shape: one |groups|-row aggregate broadcast back; no shuffle of
    * the data itself. */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
      alpha: Double, totalRows: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val wAll = Window.partitionBy(lit(0))
    val stats = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__p",
        floor(pow(col("__n").cast("double"), lit(alpha)) * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("__tgt", least(col("__n"),
        floor(lit(totalRows.toDouble)
          * (col("__p").cast("double") / sum("__p").over(wAll).cast("double"))).cast("long")))
      .select(col(groupCol), col("__n"), col("__tgt"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(pmod(graft.functions.PortableHash.hash60(col(keyCol)), col("__n")) < col("__tgt"))
      .drop("__n", "__tgt")
  }

  def quotaSample(df: DataFrame, groupCol: String, scoreCol: String,
      keyCol: String, quotas: Map[String, Int],
      defaultQuota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(keyCol).asc)
    val quotaCol = quotas.foldLeft(lit(defaultQuota)) {
      case (acc, (g, q)) => when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006): draw `u ~ U(0,1)` per
    * row and keep the k largest `u^(1/w)`; the selection probability of
    * each k-subset matches sequential weighted draws without replacement.
    * This is the principled "pick k docs per source, longer docs more
    * likely, no duplicates" primitive ([[weightedSample]] answers the
    * different question of thinning GROUPS by a fixed rate).
    *
    * Deterministic and portable like the whole family: `u` comes from the
    * seeded [[graft.functions.PortableHash]] (clamped ≥ 1/2^60 — u = 0
    * would put ln at −∞), ranked via the monotone-equivalent key
    * `ln(u)/w` quantized to integer micro-units per row — one ln site per
    * row, no float ever compared. Rows with non-positive weight have zero
    * selection probability and are excluded up front (also keeps the
    * ANSI-mode division away from w = 0).
    *
    * Scale shape: per-row projection + ONE per-group top-k window
    * (WindowGroupLimit keeps k rows per partition before the sort — no
    * global sort, no per-group collection).
    */
  def weightedPick(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int, seed: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val hv = greatest(
      graft.functions.PortableHash.hash60(col(keyCol), seed), lit(1L))
    val key = floor(log(hv / lit(1152921504606846976.0)) / col(weightCol)
      * lit(1e6) + lit(0.5)).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__key_e6").desc, col(keyCol).asc)
    df.where(col(weightCol) > 0)
      .withColumn("__key_e6", key)
      .withColumn("pick_rank", row_number().over(w).cast("int"))
      .where(col("pick_rank") <= k)
      .drop("__key_e6")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted interleave of corpus sources — the "data
  * mixing" step that turns per-source weights into a single training
  * order (stride scheduling: the k-th example of a source with weight w
  * lands at virtual time (k − ½)/w, so a weight-4 source appears 4× as
  * often as a weight-1 source in every prefix, each source internally in
  * order, no randomness anywhere).
  *
  * Virtual times are kept in exact integers: with L a common multiple of
  * all weights, position key = (2k − 1)·(L/w). Equal keys are broken by
  * (source, id), so the order is total and reproducible run-to-run.
  *
  * Scale shape: NO per-source `row_number` window — a 100 TB corpus is a
  * few huge sources, and `Window.partitionBy(source)` would collapse each
  * one into a single task. Instead the per-source sequence number comes
  * from a [[GlobalIndex]] over (source, id): because that index groups
  * sources contiguously in source order, each source's first index is
  * just the prefix sum of the per-source row counts — a map-side-combined
  * aggregate over the RAW input (not a reuse of the indexed subtree, so
  * the expensive range sort appears exactly once in the plan), broadcast
  * back as a few rows. The final rank is a second [[GlobalIndex]] over
  * the stride key — a global training order is inherently a distributed
  * range sort, and that is all this pays: two range exchanges plus one
  * cheap count aggregate.
  */
object Mixture {

  /** Append `wt` (the evaluated weight) and `mix_pos` (0-based global
    * training position) to `df`. `weight` must evaluate to a positive
    * integer dividing `strideLcm` — enforced in-plan via `raise_error`,
    * not silently rounded. `id` must be unique per row.
    *
    * The schedule is computed on a narrow (id, source, wt) projection and
    * joined back by id, so the two range sorts never carry payload
    * columns; the stride-keyed frame is `localCheckpoint`ed before the
    * final ranking because [[GlobalIndex]] consumes its input twice
    * (offsets + join) and exchange reuse does not fire across
    * `monotonically_increasing_id` subtrees — without the truncation the
    * whole first range sort runs once per consumer. */
  def interleave(df: DataFrame, id: String, source: String, weight: Column, strideLcm: Int): DataFrame = {
    require(strideLcm > 0, "strideLcm must be positive")
    val wt = weight.cast("long")
    // guard folded into the key so column pruning can't drop it
    val stride = when(wt > 0 && lit(strideLcm.toLong) % wt === 0, (lit(strideLcm.toLong) / wt).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"mixture weight must be a positive divisor of $strideLcm, got "), wt.cast("string"))).cast("long"))
    val narrow = df.select(col(id), col(source)).withColumn("wt", wt.cast("int"))
    val indexed = GlobalIndex.withGlobalIndex(narrow, "__sidx", col(source), col(id))
    // first (source,id)-index of source s = #rows in sources ordered
    // before s — a map-side-combined count over the raw input, NOT a
    // reuse of the indexed subtree; the running-total window is over
    // |sources| rows only
    val bases = narrow.groupBy(col(source).as("__bsrc")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__base",
        coalesce(
          sum(col("__cnt")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("__bsrc"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bsrc"), col("__base"))
    val keyed = indexed
      .join(broadcast(bases), col(source) === col("__bsrc"))
      .withColumn("__k", col("__sidx") - col("__base") + 1L)
      .withColumn("__key", (lit(2L) * col("__k") - 1L) * stride)
      .drop("__bsrc", "__base", "__sidx", "__k")
      .localCheckpoint()
    val ranked = GlobalIndex.withGlobalIndex(keyed, "mix_pos", col("__key"), col(source), col(id))
      .select(col(id), col("wt"), col("mix_pos"))
    df.join(ranked, Seq(id))
  }
}

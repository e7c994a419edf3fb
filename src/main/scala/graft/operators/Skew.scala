package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled complements to AQE's
  * runtime skew-join splitting (which stays ON; SkewSpec proves
  * `OptimizeSkewedJoin` fires under this engine's session shape).
  *
  * When is manual salting still REQUIRED, given AQE? AQE's skew handling
  * splits only the partitions of a sort-merge/shuffled-hash JOIN. It does
  * nothing for:
  *  - **skewed aggregations** — a `groupBy` whose hot key funnels into one
  *    reducer is not a join; use [[saltedCount]]/[[saltedSumAvg]]'s
  *    two-level shape;
  *  - **joins AQE won't split** — e.g. when the skewed shuffle feeds
  *    another operator that pins the partitioning (a window over the same
  *    key), or when a required distribution makes the split invalid; use
  *    [[saltedJoin]], which bakes the fan-out into the plan
  *    deterministically instead of relying on runtime stats.
  *
  * Salting is deterministic here — the salt is a hash of the FULL row
  * content, so the salt a given row receives is invariant across runs,
  * repartitionings and task retries (not rand(), and not
  * monotonically_increasing_id(), which depends on partition layout).
  * Identical duplicate rows co-locate on one salt; acceptable, because a
  * hot KEY's rows almost always differ in their non-key columns, and that
  * variation is what spreads them.
  */
object Skew {

  /** Layout-independent salt in [0, buckets): hash of every column. */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets))

  /** Count rows per key with a salted two-level aggregation: the first
    * level fans each hot key across `buckets` reducers (partial maps
    * combine map-side), the second sums the per-salt partials. Exactly
    * equivalent to `groupBy(keys).count()`, but no single reducer ever
    * sees a whole hot key.
    *
    * At 100 TB: a power-law key (one genre = 40% of rows) turns the plain
    * aggregation's final shuffle into one straggler task; salted, the hot
    * key's rows spread over `buckets` tasks and the second-level input is
    * |keys| × buckets rows — negligible. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int, out: String = "count"): DataFrame = {
    df.withColumn("__salt", contentSalt(df, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(out))
  }

  /** Salted sum/avg-style aggregation: same two-level shape for any
    * algebraic aggregate (partials must be re-aggregable; avg is carried
    * as sum+count and finished at the second level). */
  def saltedSumAvg(
      df: DataFrame, keyCols: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    df.withColumn("__salt", contentSalt(df, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(col(valueCol)).as("__cnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum("__sum").as(s"sum_$valueCol"),
        (sum("__sum") / sum("__cnt")).as(s"avg_$valueCol"))
  }

  /** Salted equi-join for a skewed fact key against a dimension too large
    * to broadcast: the dimension is replicated `buckets` times (one copy
    * per salt), the fact side salts deterministically, and the join key
    * becomes (key, salt) — the hot key's rows land on `buckets` different
    * reducers instead of one.
    *
    * Replication cost is |dim| × buckets rows of shuffle — chose `buckets`
    * so that's cheap relative to the fact side (it always is when the dim
    * is the small side but above the broadcast threshold). */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", contentSalt(facts, buckets))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFacts.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

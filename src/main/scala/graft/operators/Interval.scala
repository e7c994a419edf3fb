package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: all (left, right) pairs sharing a key whose
  * timestamps lie within `delta` of each other. The naive formulation —
  * an equi-join on the key with an inequality residual — degenerates into
  * a per-key time-interval product that Spark can only execute as a
  * broadcast/sort-merge join with a post-filter over every same-key pair:
  * quadratic in key frequency, hopeless at 100 TB.
  *
  * Scale path implemented here: quantize time into delta-width bins, emit
  * each RIGHT row into its own bin plus both neighbors (a fixed 3×
  * replication), equi-join on (key, bin), then apply the exact |l−r| ≤ delta
  * predicate. Every qualifying pair lands in exactly one (key, bin) bucket
  * — left rows carry a single bin, the right row's three replicas are
  * distinct — so no dedup pass is needed and candidate count is bounded by
  * 3·|right| join fan-in rather than per-key row products. Cost: one hash
  * shuffle per side, same as a plain equi-join.
  *
  * Timestamps are compared in integer MICROSECONDS (`unix_micros`), never
  * floating seconds — exact, overflow-safe to year ~294k, and identical to
  * what an external engine computes from the same parquet values.
  */
object Interval {

  private def micros(ts: String): Column = unix_micros(col(ts).cast("timestamp"))

  /** Exact floor-division of a micros column by `delta`: subtract the
    * (always non-negative) pmod remainder first, so the double division is
    * of an exact multiple — bit-exact for any sign, no boundary mis-floors. */
  private def binOf(us: Column, delta: Long): Column =
    ((us - pmod(us, lit(delta))) / lit(delta)).cast("long")

  /** Join `left` and `right` on key equality AND |leftTs − rightTs| ≤
    * `deltaMicros` (inclusive). Output = all left columns + `rightVals`
    * (which must not collide — alias on the right side first).
    */
  def joinWithin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      deltaMicros: Long, rightVals: Seq[String]): DataFrame = {
    require(deltaMicros > 0, s"deltaMicros must be positive, got $deltaMicros")
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.intersect(leftCols)} collide with left columns — alias first")

    val l = left
      .withColumn("__lus", micros(leftTs))
      .withColumn("__bin", binOf(col("__lus"), deltaMicros))
    val rBase = right.select(
      col(rightKey).as("__rkey") +: micros(rightTs).as("__rus") +: rightVals.map(col): _*)
    val r = rBase.withColumn("__bin",
      explode(array(Seq(-1L, 0L, 1L).map(o => binOf(col("__rus"), deltaMicros) + lit(o)): _*)))

    l.join(r, l("__bin") === r("__bin") && col(leftKey) === col("__rkey"))
      .filter(abs(col("__lus") - col("__rus")) <= deltaMicros)
      .select((leftCols ++ rightVals).map(col): _*)
  }

  /** Left rows with NO right row of the same key within ±`deltaMicros` —
    * the absence-as-signal face of [[joinWithin]] (funnel non-conversion,
    * missed-SLA detection, orphaned telemetry). A null-padded left-outer
    * interval join would drag the full candidate product through a
    * post-filter just to keep its failures; this instead discovers
    * matched left ids through the same bucketed 3×-replica candidate
    * path and removes them with ONE left-anti equi-join on `leftId`, so
    * the unmatched path costs a semi-join, never a product. `leftId`
    * must uniquely identify left rows. Output = all left columns,
    * unmatched rows only. */
  def antiWithin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      deltaMicros: Long, leftId: String): DataFrame = {
    val matched = joinWithin(
      left.select(leftKey, leftId, leftTs), right,
      leftKey, rightKey, leftTs, rightTs, deltaMicros, Seq.empty)
      .select(leftId)
    left.join(matched, Seq(leftId), "left_anti")
      .select(left.columns.map(col).toSeq: _*)
  }

  /** Unordered same-key pairs of rows of `df` within `deltaMicros` of each
    * other, identified by a unique `idCol`; each pair reported once with
    * id_a < id_b. Output: key, id_a, id_b, gap_us. */
  def selfPairsWithin(df: DataFrame, key: String, ts: String, idCol: String,
      deltaMicros: Long): DataFrame = {
    val left = df.select(col(key), col(idCol).as("id_a"), col(ts).as("__ts_a"))
    val right = df.select(col(key).as("__k_b"), col(idCol).as("id_b"), col(ts).as("__ts_b"))
    joinWithin(left, right, key, "__k_b", "__ts_a", "__ts_b",
        deltaMicros, Seq("id_b", "__ts_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col(key), col("id_a"), col("id_b"),
        abs(unix_micros(col("__ts_a").cast("timestamp")) -
            unix_micros(col("__ts_b").cast("timestamp"))).as("gap_us"))
  }
}

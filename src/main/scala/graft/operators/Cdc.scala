package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a changelog into a snapshot — the
  * MERGE/upsert primitive of warehouse maintenance, expressed as pure
  * DataFrame algebra so it works on plain parquet directories (no table
  * format required; pair with an overwrite sink for the rewrite).
  *
  * The changelog carries the full new row per change, a monotonically
  * increasing `versionCol` (unique per key — CDC sequence number / LSN),
  * and an `opCol` of `"u"` (upsert) / `"d"` (delete).
  *
  * Shape at scale: ONE window ranking over the changelog keyed by the
  * merge key (latest change wins — WindowGroupLimit keeps a single row per
  * key before the sort), one anti-join removing touched keys from the
  * base, one union. All key-partitioned equi-shuffles; the base is never
  * windowed, only anti-joined — so a 100 TB snapshot with a 1 GB changelog
  * streams through without state.
  */
object Cdc {

  /** New snapshot = base rows with untouched keys + the newest `"u"` row
    * per touched key (keys whose newest change is `"d"` disappear).
    * `changes` must contain every base column plus versionCol + opCol. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val missing = (base.columns.toSet + versionCol + opCol) -- changes.columns.toSet
    require(missing.isEmpty, s"changes is missing columns: $missing")
    // ties on version would make the winner nondeterministic; break by op
    // ('u' > 'd': an upsert and delete with the SAME sequence number keeps
    // the row) and document that real CDC feeds have unique versions
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = base.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = latest.filter(col(opCol) === "u")
      .select(base.columns.map(col).toSeq: _*)
    untouched.unionByName(upserts)
  }

  /** Slowly-changing-dimension type-2 history from the same changelog
    * shape: one row per upsert, valid over `[valid_from, valid_to)` in
    * version order; `valid_to` null = still open. A delete emits no row
    * but CLOSES its predecessor's interval (the `lead` runs over all
    * changes before tombstones are dropped). `is_current` marks open
    * upserts — the current snapshot is exactly `is_current`, so
    * [[applyChanges]] over an empty base agrees with this view.
    *
    * One key-partitioned window + one filter: linear, no self-join, the
    * standard SCD2 build at any scale. */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).asc)
    changes
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) === "u")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(versionCol, "valid_from")
      .drop(opCol)
  }
}

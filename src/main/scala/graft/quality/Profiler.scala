package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler: null count, distinct count, min and max per
  * column, long-format output — the generic form of the reference's
  * per-table validation aggregates, and the first thing run against an
  * unfamiliar 100 TB table before committing to a pipeline over it.
  *
  * Single scan: every metric for every column is computed in ONE
  * aggregation (Spark plans the multi-distinct via an Expand — rows are
  * replicated per distinct-column, but the input is read once and partial
  * aggregation still collapses map-side), then unpivoted with `stack`.
  * The per-column-loop alternative (`cols.map(df.agg(...)).reduce(union)`)
  * scans the table once PER COLUMN — n× the read cost at scale.
  *
  * min/max are cast to string so heterogeneous column types coexist in one
  * long-format result. NOTE: double→string rendering is engine-specific;
  * profile numeric-integer / string / date columns when cross-engine
  * comparability of min/max matters.
  */
object Profiler {

  /** Output: (column, n_nulls, n_distinct, min_value, max_value). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nulls_$c`, `__distinct_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
  }
}

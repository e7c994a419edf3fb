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

  // column names end up in generated SQL (stack args) and in attribute
  // references (functions.col parses backticks!) — escape both forms so a
  // name containing a quote or backtick can't break or inject into either.
  // Backticks double inside quoted identifiers; quotes/backslashes escape
  // inside string literals.
  private def sqlLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def sqlId(s: String) = "`" + s.replace("`", "``") + "`"

  /** Output: (column, n_nulls, n_distinct, min_value, max_value). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      val qc = col(sqlId(c))
      Seq(
        sum(when(qc.isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(qc).as(s"__distinct_$c"),
        min(qc).cast("string").as(s"__min_$c"),
        max(qc).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"${sqlLit(c)}, ${sqlId(s"__nulls_$c")}, ${sqlId(s"__distinct_$c")}, " +
        s"${sqlId(s"__min_$c")}, ${sqlId(s"__max_$c")}"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
  }
}

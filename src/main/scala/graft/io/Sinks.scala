package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Overwrite-mode sinks mirroring the reference's full-refresh semantics:
  * every hourly run drops + recreates its KPI tables and re-uploads the
  * CSVs with replace=True (`/root/reference/dags/music_streaming_etl_dags
  * .py:253-280`, `:317-329`). In Spark, `mode=Overwrite` subsumes the
  * DROP/CREATE + COPY pair.
  *
  * KPI outputs are tiny (≈genres×dates rows / ≤24 hourly rows) so
  * `singleFile` coalesces to 1 part to mirror the reference's one-CSV
  * output; large fact sinks must leave it false (parallel writers).
  */
object Sinks {

  /** CSV sink. `nullValue=""` round-trips NULLs the way the COPY options
    * BLANKSASNULL/EMPTYASNULL expect them on re-load. */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("nullValue", "")
      .csv(path)

  def parquet(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Partition-pruned fact layout — THE write-side decision that matters at
    * 100 TB: `partitionBy` turns predicate columns into directory pruning
    * (a date-filtered read opens only matching partitions — asserted in
    * LayoutSpec via the scan's selected-partition count), `sortBy`-less
    * `sortWithinPartitions` clusters rows for row-group min/max skipping
    * WITHOUT an extra shuffle (it sorts the partition the writer already
    * holds), and `maxRecordsPerFile` bounds file size so a hot partition
    * can't produce one unsplittable multi-GB file.
    *
    * Choose low-cardinality, always-filtered columns (date, region) for
    * `partitionCols`; high-cardinality keys belong in `sortCols` (or
    * bucketing, see [[Bucketing]]), never in partitionBy — millions of tiny
    * directories kill the file index. */
  def partitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    val w = sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** ORC sink (columnar sibling of [[parquet]]). */
  def orc(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).orc(path)

  /** JSON-lines sink. */
  def json(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).json(path)

  /** Warehouse table overwrite — the DROP IF EXISTS + CREATE + COPY
    * sequence (`:253-280` + `:382-410`) as one saveAsTable. */
  def table(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(name)

  /** JDBC warehouse sink — the reference's Redshift load (`dags/
    * music_streaming_etl_dags.py:382-410`) is DROP + CREATE + COPY; in
    * Spark that whole sequence is one `mode(Overwrite)` JDBC write (pass
    * `truncate=true` in options to keep the DDL and only replace rows).
    * Writes run one connection per partition — `coalesce` small KPI
    * outputs first, repartition fact-sized ones to the DB's comfortable
    * writer parallelism, and size `batchsize` (default 1000) up for bulk
    * loads. */
  def jdbc(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      options: Map[String, String] = Map.empty): Unit =
    options.foldLeft(
        df.write.format("jdbc").option("url", url).option("dbtable", table)
      ) { case (w, (k, v)) => w.option(k, v) }
      .mode(mode)
      .save()

  /** Serialize an array column to its string form at the sink boundary
    * (the reference stringifies `top_artists` via to_csv — a Python list
    * repr; we keep the typed array internally and emit a stable
    * comma-joined form, SURVEY.md §7.4.3). */
  def serializeArray(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName, concat_ws(",", transform(col(colName), _.cast("string"))))

  /** Python-list-repr variant for byte-parity with the reference CSVs:
    * `['a', 'b']`. */
  def serializeArrayPyRepr(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName,
      concat(lit("["),
        concat_ws(", ", transform(col(colName), v => concat(lit("'"), v.cast("string"), lit("'")))),
        lit("]")))
}

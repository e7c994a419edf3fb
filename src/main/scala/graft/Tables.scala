package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All tables are parquet; schemas are fixed by the generator, so we read
  * without inference — Catalyst prunes columns / pushes filters into the
  * parquet scan automatically because the plan stays declarative.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation cache — the catalog role a metastore plays for
    * named tables, for these path-addressed ones: ONE file listing +
    * footer schema inference per (session, dir, table) instead of one
    * per query reference. Metadata only — every action still scans the
    * parquet files; nothing computed is reused. Measured (r16, sf0.1):
    * a bare `spark.read.parquet` resolution costs 55-144 ms, and a
    * bench sweep makes ~700 table references, so per-query plan
    * construction was paying tens of seconds of repeated listing +
    * footer reads for immutable inputs. Keyed by session (a new session
    * re-resolves); entries of stopped sessions are dropped on access so
    * long-lived multi-session drivers don't accumulate dead relations. */
  private val relationCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  private def cached(spark: SparkSession, dir: String, name: String)
      (resolve: => DataFrame): DataFrame = {
    val key = (spark, dir, name)
    val hit = relationCache.get(key)
    if (hit != null) hit
    else {
      val it = relationCache.keySet().iterator()
      while (it.hasNext) {
        if (it.next()._1.sparkContext.isStopped) it.remove()
      }
      val df = resolve
      val prev = relationCache.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects during schema inference (PARQUET_TYPE_ILLEGAL) unless the
    * session-wide `spark.sql.legacy.parquet.nanosAsLong` flag is set. We
    * avoid the session conf entirely: declaring the schema explicitly (with
    * `ts` as LONG) skips inference, and the execution-time reader happily
    * decodes the INT64 nanos into the requested LongType — verified with the
    * session flag unset. The raw nanos are then truncated to a microsecond
    * timestamp — the same truncation DuckDB applies, so both engines see
    * identical values. Integer `div` (not `/`) — ns since epoch exceeds
    * 2^53, double division would lose precision.
    *
    * The schema is the generator's fixed contract (TESTDATA.md); no other
    * graft table carries TIMESTAMP(NANOS), so only this loader needs it. */
  private val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // physical TIMESTAMP(NANOS) read as raw nanos
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** True iff the parquet file(s) at `path` declare `ts` as
    * TIMESTAMP(NANOS). Reads ONE footer on the driver (no Spark job, no
    * schema-inference error noise). Directory inputs are searched
    * recursively for the first leaf `*.parquet` file, so partitioned
    * layouts (`date=…/part-….parquet`) probe correctly.
    *
    * Probe failures default to FALSE (plain read): on a real
    * TIMESTAMP(MICROS) file the nanos treatment would silently divide `ts`
    * by 1000 — exactly the corruption this guard exists to prevent — while
    * the false-on-nanos direction merely fails loudly at read time
    * (PARQUET_TYPE_ILLEGAL), which is recoverable and visible. */
  private def tsIsNanos(spark: SparkSession, path: String): Boolean =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      def findLeaf(dir: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
        val entries = fs.listStatus(dir).sortBy(_.getPath.getName)
        entries.collectFirst {
          case e if e.isFile && e.getPath.getName.endsWith(".parquet") => e.getPath
        }.orElse(
          entries.iterator.filter(_.isDirectory)
            .flatMap(e => findLeaf(e.getPath)).nextOption())
      }
      val file =
        if (fs.getFileStatus(p).isDirectory)
          findLeaf(p).getOrElse(
            throw new java.io.FileNotFoundException(s"no *.parquet leaf under $path"))
        else p
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFileMetaData.getSchema
        val ann = schema.getType(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation
        ann match {
          case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        }
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"ts-unit probe failed for $path; assuming non-nanos (plain read): $e")
        false
    }

  /** Type guard: the nanos treatment (declared LONG schema + div-1000
    * truncation) applies only when the file actually carries
    * TIMESTAMP(NANOS) — a regenerated micros file reads plainly, instead
    * of being silently divided by 1000. */
  def events(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "events")(eventsResolve(spark, dir))

  private def eventsResolve(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    if (tsIsNanos(spark, path))
      spark.read.schema(eventsRawSchema).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else {
      // a timezone-naive (micros) file reads as TIMESTAMP_NTZ; normalize
      // to TimestampType so downstream sees ONE ts flavor regardless of
      // which file generation produced the data. Session TZ is pinned to
      // UTC, so the naive→instant cast is the identity interpretation the
      // nanos path (epoch-micros) already uses.
      val df = spark.read.parquet(path)
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
        case _ => df
      }
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Synthetic PARTSUPP: the testdata has no partsupp parquet, but TPC-H's
    * last four query shapes (Q2 correlated min-cost, Q9 profit, Q11
    * HAVING-share, Q20 nested semi-join) need one. Derived
    * DETERMINISTICALLY from lineitem — the distinct `(l_partkey,
    * l_suppkey)` pairs plus closed-form integer columns from key
    * arithmetic — so the DuckDB oracle rebuilds the IDENTICAL relation
    * from the same parquet with the same SQL (the generated-oracle
    * discipline of the hash-family oracles in SparkEntry). All-integer
    * arithmetic on positive int64 keys: `%` agrees across both engines
    * and nothing touches a double.
    *
    *   - `ps_availqty`          = (pk*7  + sk*13) % 9999 + 1     (1..9999)
    *   - `ps_supplycost_cents`  = (pk*31 + sk*17) % 100000 + 100 (1.00..1000.99 $, exact cents)
    *
    * The derivation is one map-side-combinable distinct over a two-column
    * projection of lineitem (partial aggregation collapses each scan
    * partition to its unique pairs before the shuffle). A production
    * deployment would materialize this once; at bench scale the distinct
    * costs a fraction of a second and keeping the plan declarative lets
    * Catalyst push `l_partkey`/`l_suppkey` predicates into the scan. */
  def partsupp(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 13) % 9999 + lit(1L))
      .withColumn("ps_supplycost_cents",
        (col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 100000 + lit(100L))
}

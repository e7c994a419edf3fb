package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy flag) and truncate to a
    * microsecond timestamp — the same truncation DuckDB applies, so both
    * engines see identical values. Integer `div` (not `/`) — ns since epoch
    * exceeds 2^53, double division would lose precision.
    *
    * SESSION CONTRACT: `spark.sql.legacy.parquet.nanosAsLong=true` must be
    * set for the session ([[GraftSession]] and the Verify/Bench mains set it
    * at build time). It cannot be scoped to this read — Spark consults only
    * the session conf for parquet schema conversion (a reader `.option` is
    * ignored, verified empirically), and the returned DataFrame executes
    * lazily long after this call returns. For sessions built without the
    * factory we enforce the contract here once; the flag's only effect is on
    * TIMESTAMP(NANOS) columns, which no other graft table carries. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

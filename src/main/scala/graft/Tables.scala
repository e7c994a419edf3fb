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

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

package graft

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession factory for the graft engine — the entry point
  * a user switching from the reference would call first.
  *
  * Encodes the engine's session contract in one place:
  *  - AQE on (runtime re-planning, skew-join splitting — default in Spark 4
  *    but pinned here explicitly because operators rely on it);
  *  - shuffle partitions sized to the cluster (caller passes cores for
  *    local mode; on a real cluster leave 0 to keep the site default and
  *    let AQE coalesce);
  *  - UTC session timezone (reference timestamps are naive; SURVEY §7.4.5);
  *  - graft SQL functions registered (`rolling_hash`, `dot_product`).
  */
object GraftSession {

  def builder(appName: String = "graft", shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // session contract for Tables.events (TIMESTAMP(NANOS) parquet) — see
      // Tables.scala; harmless for every other source
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
    if (shufflePartitions > 0) b.config("spark.sql.shuffle.partitions", shufflePartitions)
    else b
  }

  /** Local-mode convenience: `local[cores]` with matching shuffle width. */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = builder(appName, shufflePartitions = cores)
      .master(s"local[$cores]")
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose builder-time
    // extensions didn't run — install() is idempotent either way.
    graft.plans.GraftExtensions.install(spark)
    spark
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalSpec extends SparkSpec {
  import spark.implicits._

  private val Delta = 60L * 1000000L // 60 s in micros

  // (key, id, ts-seconds-offset) fixture with in-bin, cross-bin-boundary,
  // exactly-at-delta, just-past-delta, and cross-key cases
  private def fixture = Seq(
    (1L, 10L, 0L), (1L, 11L, 30L), (1L, 12L, 60L), (1L, 13L, 121L),
    (2L, 20L, 59L), (2L, 21L, 119L), (2L, 22L, 300L),
    (3L, 30L, 45L)
  ).toDF("k", "id", "off")
    .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("off")))
    .drop("off")

  test("selfPairsWithin matches the naive inequality self-join exactly") {
    val df = fixture
    val fast = Interval.selfPairsWithin(df, "k", "ts", "id", Delta)
      .select("k", "id_a", "id_b", "gap_us").as[(Long, Long, Long, Long)]
      .collect().toSet
    val b = df.select(col("k").as("kb"), col("id").as("idb"), col("ts").as("tsb"))
    val naive = df.join(b, col("k") === col("kb") && col("id") < col("idb") &&
        abs(unix_micros(col("ts")) - unix_micros(col("tsb"))) <= Delta)
      .select(col("k"), col("id"), col("idb"),
        abs(unix_micros(col("ts")) - unix_micros(col("tsb"))).as("gap"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == naive)
    // sanity: the fixture exercises inclusive-at-delta (10↔12 gap exactly 60s)
    assert(fast.contains((1L, 10L, 12L, Delta)))
    // and excludes just-past-delta (12: 60s vs 13: 121s → 61s apart)
    assert(!fast.exists(p => p._2 == 12L && p._3 == 13L))
  }

  test("each qualifying pair is produced exactly once (no bin-overlap dupes)") {
    val df = fixture
    val pairs = Interval.selfPairsWithin(df, "k", "ts", "id", Delta)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length == pairs.toSet.size)
  }

  test("joinWithin keeps only same-key pairs and respects rightVals projection") {
    val left = fixture
    val right = fixture.select(col("k").as("rk"), col("ts").as("rts"),
      (col("id") * 100).as("rid"))
    val out = Interval.joinWithin(left, right, "k", "rk", "ts", "rts",
      Delta, Seq("rid"))
    assert(out.columns.toSeq == Seq("k", "id", "ts", "rid"))
    // key 3 has one row; it only matches its own replica
    assert(out.filter(col("k") === 3L).select("rid").as[Long].collect().toSeq == Seq(3000L))
    // colliding rightVals rejected
    val bad = intercept[IllegalArgumentException] {
      Interval.joinWithin(left, right.withColumnRenamed("rid", "id"),
        "k", "rk", "ts", "rts", Delta, Seq("id"))
    }
    assert(bad.getMessage.contains("collide"))
  }

  test("result is invariant under input repartitioning") {
    val df = fixture
    val a = Interval.selfPairsWithin(df, "k", "ts", "id", Delta)
      .collect().map(_.toString).sorted.toSeq
    val b = Interval.selfPairsWithin(df.repartition(7), "k", "ts", "id", Delta)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("antiWithin matches the naive NOT EXISTS exactly and keeps left columns") {
    val left = fixture
    val right = Seq((1L, 35L), (2L, 290L), (9L, 0L)) // key 9 matches nothing
      .toDF("rk", "roff")
      .withColumn("rts", timestamp_seconds(lit(1700000000L) + col("roff")))
      .drop("roff")
    val fast = Interval.antiWithin(left, right, "k", "rk", "ts", "rts", Delta, "id")
    assert(fast.columns.toSeq == left.columns.toSeq)
    val matchedIds = left.join(right,
        col("k") === col("rk") &&
          abs(unix_micros(col("ts")) - unix_micros(col("rts"))) <= Delta)
      .select("id").as[Long].collect().toSet
    val naive = left.filter(!col("id").isin(matchedIds.toSeq: _*))
      .select("id").as[Long].collect().toSet
    assert(fast.select("id").as[Long].collect().toSet == naive)
    // right (1, t=35s) covers ids 10 (gap 35) 11 (gap 5) 12 (gap 25), not 13
    // (gap 86); right (2, t=290s) covers only 22 (gap 10); key 3 unmatched
    assert(fast.select("id").as[Long].collect().toSet ==
      Set(13L, 20L, 21L, 30L))
  }

  test("candidate replication is the fixed 3x, not per-key quadratic") {
    // 1000 rows, one hot key, uniform times over 1000 bins: naive same-key
    // candidates = ~500k pairs; binned candidates ≤ 3 per row per occupied
    // neighborhood. We assert the *result* stays linear-sized and correct
    // on a spot check, and that the op completes fast enough to not be the
    // quadratic plan (structural guarantee is the equi-join on (key, bin)).
    val big = spark.range(1000).select(
      lit(1L).as("k"), col("id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 3600).as("ts"))
    val n = Interval.selfPairsWithin(big, "k", "ts", "id", Delta).count()
    assert(n == 0) // rows are 1h apart, delta is 60s — nothing qualifies
    val dense = spark.range(1000).select(
      lit(1L).as("k"), col("id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 45).as("ts"))
    // 45s spacing, 60s delta → each row pairs with exactly its successor
    assert(Interval.selfPairsWithin(dense, "k", "ts", "id", Delta).count() == 999)
  }
}

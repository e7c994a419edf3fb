package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  test("window pairs match the single-node sorted order exactly") {
    val df = Seq(
      (1L, "smith john"), (2L, "smith jon"), (3L, "smyth john"),
      (4L, "adams jane"), (5L, "adams janet"), (6L, "zhang wei"),
      (7L, "zhang wei")  // duplicate key — id tiebreak orders it
    ).toDF("id", "key")
    val got = SortedNeighborhood.candidatePairs(df, "id", "key", window = 2)
      .select("id_a", "id_b", "rank_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference: local sort by (key, id), pairs within 2 positions
    val order = Seq((1L, "smith john"), (2L, "smith jon"), (3L, "smyth john"),
      (4L, "adams jane"), (5L, "adams janet"), (6L, "zhang wei"), (7L, "zhang wei"))
      .sortBy { case (id, k) => (k, id) }.map(_._1)
    val want = (for {
      i <- order.indices; j <- (i + 1) to math.min(i + 2, order.length - 1)
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got === want)
  }

  test("every record yields at most `window` successor pairs; boundaries lossless") {
    // enough rows to span multiple range partitions
    val df = spark.range(0, 1000).select(col("id"),
      format_string("k%04d", col("id")).as("key"))
    val pairs = SortedNeighborhood.candidatePairs(df, "id", "key", window = 3)
    // ids sort in key order here, so pair set is exactly (i, i+d), d<=3
    assert(pairs.count() === (999 + 998 + 997).toLong)
    val bad = pairs.filter(col("id_b") - col("id_a") =!= col("rank_dist")).count()
    assert(bad === 0L)
  }

  test("multi-pass: a pair adjacent only under the second key is caught, n_passes counts orderings") {
    // under k1, ids 1 and 2 are separated by 3..5; under k2 they sort adjacent
    val df = Seq(
      (1L, "aaa", "zzz"), (3L, "bbb", "mmm"), (4L, "ccc", "nnn"),
      (5L, "ddd", "ooo"), (2L, "eee", "zzy")
    ).toDF("id", "k1", "k2")
    val got = SortedNeighborhood
      .candidatePairsMultiKey(df, "id", Seq("k1", "k2"), window = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // k1 order: 1,3,4,5,2 → pairs (1,3),(3,4),(4,5),(2,5)
    // k2 order: 3,4,5,2,1 → pairs (3,4),(4,5),(2,5),(1,2)
    assert(got === Map(
      (1L, 3L) -> 1L, (3L, 4L) -> 2L, (4L, 5L) -> 2L,
      (2L, 5L) -> 2L, (1L, 2L) -> 1L))
  }

  test("window=1 is adjacent-only") {
    val df = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("id", "key")
    val got = SortedNeighborhood.candidatePairs(df, "id", "key", 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 20L), (20L, 30L)))
  }
}

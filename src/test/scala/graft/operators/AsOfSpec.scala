package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600000L + m * 60000L)

  // right side: key 1 has rows at t=10 and t=30; key 2 has none
  private def right = Seq(
    (1L, ts(10), 100L, 10.0),
    (1L, ts(30), 101L, 30.0)
  ).toDF("key", "rts", "rid", "rval")

  private def left = Seq(
    (1L, ts(5), "before-any"),
    (1L, ts(10), "at-first"),   // inclusive: sees the t=10 row
    (1L, ts(20), "between"),
    (1L, ts(99), "after-last"),
    (2L, ts(50), "no-right")
  ).toDF("key", "lts", "tag")

  test("asof join picks the greatest right ts ≤ left ts, inclusive, null when none") {
    val out = AsOf.join(left, right, "key", "key", "lts", "rts", Seq("rid", "rval"))
      .collect().map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(r.fieldIndex("rid"))) None else Some(r.getAs[Long]("rid")))).toMap
    assert(out("before-any").isEmpty)
    assert(out("at-first").contains(100L))
    assert(out("between").contains(100L))
    assert(out("after-last").contains(101L))
    assert(out("no-right").isEmpty)
  }

  test("carried values stay paired with their source row") {
    val out = AsOf.join(left, right, "key", "key", "lts", "rts", Seq("rid", "rval"))
      .filter($"tag" === "after-last").collect().head
    assert(out.getAs[Long]("rid") == 101L && out.getAs[Double]("rval") == 30.0)
  }

  test("latestPerKeyTs collapses same-timestamp rows deterministically (max tieBreak wins)") {
    val dups = Seq(
      (1L, ts(10), 7L, 7.0),
      (1L, ts(10), 9L, 9.0),  // same (key, ts) — rid 9 must win both vals
      (1L, ts(20), 5L, 5.0)
    ).toDF("key", "rts", "rid", "rval")
    val out = AsOf.latestPerKeyTs(dups, "key", "rts", "rid", Seq("rid", "rval"))
      .collect().map(r => r.getAs[Timestamp]("rts") -> (r.getAs[Long]("rid"), r.getAs[Double]("rval"))).toMap
    assert(out(ts(10)) == ((9L, 9.0)))
    assert(out(ts(20)) == ((5L, 5.0)))
  }

  test("null keys never match; null-key left rows survive unmatched") {
    // DuckDB ASOF / pandas merge_asof equality semantics: NULL ≠ NULL.
    // A window partitionBy would group nulls together and pair them —
    // regression for exactly that.
    val l = Seq(
      (Option(1L), ts(20), "real-key"),
      (Option.empty[Long], ts(20), "null-key")
    ).toDF("key", "lts", "tag")
    val r = Seq(
      (Option(1L), ts(10), 100L),
      (Option.empty[Long], ts(10), 666L) // must never be picked up
    ).toDF("key", "rts", "rid")
    val out = AsOf.join(l, r, "key", "key", "lts", "rts", Seq("rid"))
      .collect().map(row => row.getAs[String]("tag") ->
        (if (row.isNullAt(row.fieldIndex("rid"))) None else Some(row.getAs[Long]("rid")))).toMap
    assert(out.size == 2) // left-join shape: both rows survive
    assert(out("real-key").contains(100L))
    assert(out("null-key").isEmpty)
  }

  test("result is invariant under input repartitioning (window is key-partitioned)") {
    val a = AsOf.join(left.repartition(7), right.repartition(3), "key", "key", "lts", "rts", Seq("rid"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.get(r.fieldIndex("rid"))))).toSet
    val b = AsOf.join(left, right, "key", "key", "lts", "rts", Seq("rid"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.get(r.fieldIndex("rid"))))).toSet
    assert(a == b)
  }

  test("colliding rightVals names are rejected") {
    intercept[IllegalArgumentException] {
      AsOf.join(left.withColumnRenamed("tag", "rid"), right, "key", "key", "lts", "rts", Seq("rid"))
    }
  }

  private def rid(df: org.apache.spark.sql.DataFrame): Map[String, Option[Long]] =
    df.collect().map(r => r.getAs[String]("tag") ->
      (if (r.isNullAt(r.fieldIndex("rid"))) None else Some(r.getAs[Long]("rid")))).toMap

  test("forward direction picks the smallest right ts >= left ts, inclusive") {
    val out = rid(AsOf.join(left, right, "key", "key", "lts", "rts",
      Seq("rid", "rval"), direction = "forward"))
    assert(out("before-any").contains(100L)) // t=5 → next is t=10
    assert(out("at-first").contains(100L))   // inclusive at equal ts
    assert(out("between").contains(101L))    // t=20 → next is t=30
    assert(out("after-last").isEmpty)        // nothing after t=99
    assert(out("no-right").isEmpty)
  }

  test("nearest picks the smaller gap; exact ties go backward") {
    val out = rid(AsOf.join(left, right, "key", "key", "lts", "rts",
      Seq("rid", "rval"), direction = "nearest"))
    assert(out("before-any").contains(100L)) // only forward exists
    assert(out("at-first").contains(100L))   // gap 0
    assert(out("between").contains(100L))    // tie 10 vs 10 → backward
    assert(out("after-last").contains(101L)) // only backward exists
    val nearer = rid(AsOf.join(
      Seq((1L, ts(26), "x")).toDF("key", "lts", "tag"),
      right, "key", "key", "lts", "rts", Seq("rid"), direction = "nearest"))
    assert(nearer("x").contains(101L)) // 4 min forward beats 16 min back
  }

  test("tolerance nulls matches whose gap exceeds it, keeping left rows") {
    val out = rid(AsOf.join(left, right, "key", "key", "lts", "rts",
      Seq("rid", "rval"), toleranceMicros = 5L * 60 * 1000000L)) // 5 min
    assert(out("at-first").contains(100L))   // gap 0
    assert(out("between").isEmpty)           // 10 min back — too far
    assert(out("after-last").isEmpty)        // 69 min back
    assert(out.size == 5)                    // all left rows survive
  }
}

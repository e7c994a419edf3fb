package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class SweepLineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("peak concurrency over a known overlap pattern") {
    // [0,10) [5,15) [8,12) → 3 live at t=8; [20,30) alone
    val iv = Seq((ts(0), ts(10)), (ts(5), ts(15)), (ts(8), ts(12)), (ts(20), ts(30)))
      .toDF("s", "e")
    val peak = SweepLine.peakConcurrent(iv, col("s"), col("e"))
      .head().getLong(0)
    assert(peak == 3L)
  }

  test("half-open semantics: touching intervals do not overlap") {
    val iv = Seq((ts(0), ts(10)), (ts(10), ts(20))).toDF("s", "e")
    assert(SweepLine.peakConcurrent(iv, col("s"), col("e")).head().getLong(0) == 1L)
  }

  test("cross-segment intervals carry through the offset phase") {
    // minute-granularity segments force every interval across boundaries
    val iv = Seq((ts(0), ts(5)), (ts(1), ts(6)), (ts(2), ts(7))).toDF("s", "e")
    val peak = SweepLine.peakConcurrent(iv, col("s"), col("e"),
      segment = date_trunc("minute", _)).head().getLong(0)
    assert(peak == 3L) // all three live in [2,5)
  }

  test("matches the naive single-sort sweep on random intervals, any segmentation") {
    val rnd = new scala.util.Random(7)
    val iv = Seq.fill(300) {
      val s = rnd.nextInt(10000).toLong
      (ts(s), ts(s + 1 + rnd.nextInt(500)))
    }.toDF("s", "e")
    // naive oracle: global sort of deltas (fine at spec scale)
    val pts = iv.select(col("s").as("t"), lit(1L).as("d"))
      .unionAll(iv.select(col("e").as("t"), lit(-1L).as("d")))
      .orderBy(col("t"), col("d")).collect()
    var live = 0L; var naive = 0L
    pts.foreach { r => live += r.getLong(1); naive = math.max(naive, live) }
    for (seg <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        date_trunc("hour", _), date_trunc("day", _))) {
      val got = SweepLine.peakConcurrent(iv.repartition(7), col("s"), col("e"), seg)
        .head().getLong(0)
      assert(got == naive, s"distributed sweep diverged from naive: $got vs $naive")
    }
  }
}

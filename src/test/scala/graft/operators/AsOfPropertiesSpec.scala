package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import scala.util.Random

/** Randomized equivalence of AsOf.join against a brute-force per-row
  * reference, for all three directions and with tolerance — fixed seeds,
  * so deterministic despite being property-style. Guards the
  * reversed-running-frame encoding of `forward` (an UnboundedFollowing
  * frame rewritten for O(n) streaming) against tie/ordering regressions. */
class AsOfPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  /** Brute force: for each left row, scan all right rows of its key. */
  private def expected(
      left: Seq[(Long, Long, Long)],     // (eventId, key, minute)
      right: Map[(Long, Long), Long],    // (key, minute) -> value
      direction: String, tolMinutes: Long): Map[Long, Option[Long]] =
    left.map { case (id, k, m) =>
      val cands = right.collect { case ((rk, rm), v) if rk == k => (rm, v) }
      val pick = direction match {
        case "backward" => cands.filter(_._1 <= m).toSeq.sortBy(_._1).lastOption
        case "forward"  => cands.filter(_._1 >= m).toSeq.sortBy(_._1).headOption
        case "nearest"  =>
          val b = cands.filter(_._1 <= m).toSeq.sortBy(_._1).lastOption
          val f = cands.filter(_._1 >= m).toSeq.sortBy(_._1).headOption
          (b, f) match {
            case (Some(bb), Some(ff)) =>
              if (m - bb._1 <= ff._1 - m) Some(bb) else Some(ff)
            case (x, y) => x.orElse(y)
          }
      }
      id -> pick.filter(p => math.abs(p._1 - m) <= tolMinutes).map(_._2)
    }.toMap

  test("all directions match brute force on random data (incl. ties and tolerance)") {
    val rnd = new Random(7)
    // small minute range on purpose: forces exact-tie timestamps
    val left = (1L to 120L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(30).toLong))
    val rightRaw = (1 to 80).map { _ =>
      ((rnd.nextInt(5).toLong, rnd.nextInt(30).toLong), rnd.nextInt(1000).toLong)
    }
    val right = rightRaw.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }

    val leftDf = left.map { case (id, k, m) => (id, k, ts(m)) }
      .toDF("event_id", "k", "t")
    val rightDf = right.toSeq.map { case ((k, m), v) => (k, ts(m), v, v) }
      .toDF("rk", "rt", "tie", "val")
    val deduped = AsOf.latestPerKeyTs(rightDf, "rk", "rt", "tie", Seq("val"))

    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(Long.MaxValue, 5L)) {
      val tolMicros = if (tol == Long.MaxValue) Long.MaxValue else tol * 60L * 1000000L
      val got = AsOf.join(leftDf, deduped, "k", "rk", "t", "rt",
          Seq("val"), direction = dir, toleranceMicros = tolMicros)
        .select("event_id", "val").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val want = expected(left, right, dir, if (tol == Long.MaxValue) Long.MaxValue / 120 else tol)
      assert(got == want, s"direction=$dir tol=$tol")
    }
  }
}

package graft.operators

import graft.SparkSpec

/** Randomized equivalence of the bucketed interval operators against
  * brute-force references — fixed seed, times deliberately clustered
  * within ±2 s of bin multiples so every run stresses the replica/bin
  * boundary cases (the place a quantization bug would hide). */
class IntervalPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val Delta = 60L * 1000000L // 60 s in micros
  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("selfPairsWithin and antiWithin match brute force on random boundary-heavy data") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 150L).map { i =>
      val sec = rnd.nextInt(8) * 60L + rnd.nextInt(5) - 2 // hug bin edges
      (rnd.nextInt(6).toLong, i, sec)
    }
    val df = rows.map { case (k, id, sec) => (k, id, ts(sec)) }.toDF("k", "id", "ts")

    val expPairs = (for {
      (k1, i1, s1) <- rows; (k2, i2, s2) <- rows
      if k1 == k2 && i1 < i2 && math.abs(s1 - s2) * 1000000L <= Delta
    } yield (k1, i1, i2)).toSet
    val gotPairs = Interval.selfPairsWithin(df, "k", "ts", "id", Delta)
      .select("k", "id_a", "id_b").as[(Long, Long, Long)].collect().toSet
    assert(gotPairs == expPairs)

    val rrows = (1 to 60).map { _ =>
      (rnd.nextInt(6).toLong, rnd.nextInt(8) * 60L + rnd.nextInt(5) - 2L)
    }
    val rdf = rrows.map { case (k, sec) => (k, ts(sec)) }.toDF("rk", "rts")
    val expAnti = rows.collect {
      case (k, i, s) if !rrows.exists { case (rk, rs) =>
        rk == k && math.abs(rs - s) * 1000000L <= Delta } => i
    }.toSet
    val gotAnti = Interval
      .antiWithin(df, rdf, "k", "rk", "ts", "rts", Delta, "id")
      .select("id").as[Long].collect().toSet
    assert(gotAnti == expAnti)
  }
}

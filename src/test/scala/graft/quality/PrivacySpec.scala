package graft.quality

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    ("NE", 10, "a"), ("NE", 10, "b"), ("NE", 10, "c"),
    ("SW", 10, "d"), ("SW", 20, "e")
  ).toDF("region", "nation", "name")

  test("kAnonymityRisk flags classes under k and only those") {
    val out = Privacy.kAnonymityRisk(people, Seq("region", "nation"), k = 3)
      .as[(String, Int, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("NE", 10)) == ((3L, false)))
    assert(out(("SW", 10)) == ((1L, true)))
    assert(out(("SW", 20)) == ((1L, true)))
  }

  test("kAnonymityRisk rejects degenerate arguments") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityRisk(people, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityRisk(people, Seq("region"), k = 1)
    }
  }

  test("dpNoisyCounts matches the hand-evaluated Laplace inverse CDF") {
    val out = Privacy.dpNoisyCounts(people, Seq("region"), eps = 1.0, seed = 17)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // replicate the draw on the driver for one key
    def noisy(key: String, n: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"17:$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = math.max(java.lang.Long.parseLong(hex.take(15), 16), 1L)
      val u = h / 1152921504606846976.0 - 0.5
      n * 1000000L +
        math.floor(-1.0 * 1.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
          * 1e6 + 0.5).toLong
    }
    assert(out("NE") == ((3L, noisy("NE", 3))))
    assert(out("SW") == ((2L, noisy("SW", 2))))
    // noise is bounded sanity: within ±20·b·1e6 of the true count
    out.values.foreach { case (n, v) => assert(math.abs(v - n * 1000000L) < 20000000L) }
  }

  test("dpNoisyCounts: seed changes the draw, counts stay exact") {
    val a = Privacy.dpNoisyCounts(people, Seq("region"), eps = 1.0, seed = 17)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val b = Privacy.dpNoisyCounts(people, Seq("region"), eps = 1.0, seed = 18)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(a.keySet == b.keySet && a.keySet.exists(k => a(k) != b(k)))
  }

  test("dpNoisyCounts: smaller epsilon means larger expected noise scale") {
    def totalAbsNoise(eps: Double): Long =
      Privacy.dpNoisyCounts(people, Seq("region", "nation"), eps, seed = 17)
        .select(abs(col("noisy_n_e6") - col("n") * lit(1000000L)))
        .as[Long].collect().sum
    // same uniforms, scale multiplies: eps 0.1 → exactly 10× the eps-1 noise
    // up to per-group rounding (±1 micro-unit each)
    val n1 = totalAbsNoise(1.0)
    val n01 = totalAbsNoise(0.1)
    assert(n01 > 9L * n1 && n01 < 11L * n1)
  }

  test("dpNoisyCounts: null-skewed group keys draw independent noise") {
    // concat_ws SKIPS nulls, so (NULL,'x') and ('x',NULL) would collide
    // into one seed without the explicit null marker → identical noise
    val df = Seq[(Option[String], Option[String])](
      (None, Some("x")), (Some("x"), None)).toDF("a", "b")
    val noises = Privacy.dpNoisyCounts(df, Seq("a", "b"), eps = 1.0, seed = 17)
      .select(col("noisy_n_e6") - col("n") * lit(1000000L))
      .as[Long].collect()
    assert(noises.length == 2 && noises.distinct.length == 2)
  }
}

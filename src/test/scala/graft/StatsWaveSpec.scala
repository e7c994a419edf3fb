package graft

import org.apache.spark.sql.functions._

/** Structural/property checks for the round-9 statistics wave — the
  * invariants that would fail FIRST (and legibly) if a derivation
  * drifted, before surfacing as an opaque oracle hash mismatch. */
class StatsWaveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans_fit: clusters partition the corpus and ids come from the seed set") {
    val out = SparkEntry.queries("kmeans_fit")(spark, dir).collect()
    val total = Tables.embeddings(spark, dir).count()
    assert(out.map(_.getLong(1)).sum == total,
      "cluster sizes must partition every vector exactly once")
    assert(out.length <= 8 && out.nonEmpty)
    val seeds = Tables.embeddings(spark, dir)
      .select("vec_id").orderBy("vec_id").limit(8)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).forall(seeds.contains),
      "cluster ids are the seed vec_ids by construction")
    assert(out.forall(_.getLong(2) >= 0L), "inertia is a sum of squares")
  }

  test("spearman_corr matches a sequential exact-integer recomputation") {
    val got = SparkEntry.queries("spearman_corr")(spark, dir).collect().head
    val pairs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("xc"))
      .join(Tables.lineitem(spark, dir).groupBy("l_orderkey")
        .agg(count(lit(1)).as("yc")), col("o_orderkey") === col("l_orderkey"))
      .select("xc", "yc").collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = pairs.length.toLong
    def rank2(xs: Seq[Long]): Map[Long, Long] = {
      // 2× average tie rank = 2·(cum_before) + cnt + 1, per distinct value
      val grouped = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      grouped.map { case (v, c) =>
        val r2 = 2L * cum + c + 1; cum += c; v -> r2
      }.toMap
    }
    val rx = rank2(pairs.map(_._1)); val ry = rank2(pairs.map(_._2))
    val (sxy, sxx, syy) = pairs.foldLeft((BigInt(0), BigInt(0), BigInt(0))) {
      case ((a, b, c), (x, y)) =>
        val dx = BigInt(rx(x) - n - 1); val dy = BigInt(ry(y) - n - 1)
        (a + dx * dy, b + dx * dx, c + dy * dy)
    }
    val expected = math.floor(sxy.toDouble /
      (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble)) * 1e6 + 0.5).toLong
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == expected, "rho_e6 drifted from the sequential recomputation")
  }

  test("attribution_markov: removal can only reduce absorption (effects in [0, 1e6])") {
    val out = SparkEntry.queries("attribution_markov")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getLong(1); val eff = r.getLong(2)
      assert(p >= 0L && p <= 1000000L, s"p_conv out of [0,1]: $p")
      // removing a channel deletes nonnegative path mass under the SAME
      // truncating arithmetic, so the effect is monotone nonnegative
      assert(eff >= 0L && eff <= 1000000L, s"removal effect out of [0,1]: $eff")
    }
  }

  test("trigram_search equals the plain contains() scan it accelerates") {
    val got = SparkEntry.queries("trigram_search")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = Tables.documents(spark, dir)
      .filter(instr(col("text"), "data batch") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "candidate+verify must be lossless vs the full scan")
    assert(got.nonEmpty, "degenerate pattern: zero matches proves nothing")
  }

  test("hodges_lehmann: pair counts are exactly d(d+1)/2 over distinct days") {
    val days = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day")).distinct()
      .groupBy("event_type").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("hodges_lehmann")(spark, dir).collect().foreach { r =>
      val d = days(r.getString(0))
      assert(r.getLong(1) == d * (d + 1) / 2,
        s"${r.getString(0)}: Walsh pair count != d(d+1)/2")
    }
  }

  test("value_lift_deciles: deciles partition rows and positives exactly") {
    val out = SparkEntry.queries("value_lift_deciles")(spark, dir).collect()
    val base = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("p"))
      .collect().head
    assert(out.map(_.getLong(1)).sum == base.getLong(0))
    assert(out.map(_.getLong(2)).sum == base.getLong(1))
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
  }

  test("conversion_wilson_ci: the point estimate lies inside every interval") {
    SparkEntry.queries("conversion_wilson_ci")(spark, dir).collect().foreach { r =>
      val (n, pos, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val pE6 = pos * 1000000L / n
      assert(lo <= pE6 && pE6 <= hi, s"arm ${r.getLong(0)}: p̂=$pE6 outside [$lo,$hi]")
      assert(lo >= 0L && hi <= 1000000L, "Wilson stays inside [0,1] by construction")
    }
  }

  test("wasserstein_value and distribution_psi are nonnegative (up to per-bin rounding)") {
    val w = SparkEntry.queries("wasserstein_value")(spark, dir).collect().head
    assert(w.getLong(2) >= 0L, "W1 is an integral of an absolute value")
    val p = SparkEntry.queries("distribution_psi")(spark, dir).collect().head
    // each of the ≤10 floored bin terms errs by < 1 in e6 units
    assert(p.getLong(3) >= -p.getLong(2), s"PSI below the rounding floor: ${p.getLong(3)}")
  }

  test("spend_theil_index is within [0 − slack, ln(n)]") {
    val t = SparkEntry.queries("spend_theil_index")(spark, dir).collect().head
    val (n, theil) = (t.getLong(0), t.getLong(2))
    assert(theil >= -1L, "Theil T is nonnegative (slack = summed rounding)")
    assert(theil <= math.ceil(math.log(n.toDouble) * 1e6).toLong,
      "Theil T is bounded by ln(n) at maximal inequality")
  }

  test("dup_graph_harmonic: d1 degrees are exact and shells are disjoint by construction") {
    val out = SparkEntry.queries("dup_graph_harmonic")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n1, n2, n3, h) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(h == n1 * 1000000L + n2 * 500000L + n3 * 333333L)
      assert(n1 > 0L, "every emitted node has at least one direct edge")
    }
  }
}

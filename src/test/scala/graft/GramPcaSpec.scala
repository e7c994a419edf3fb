package graft

import graft.operators.GramPca

class GramPcaSpec extends SparkSpec {
  import spark.implicits._

  // 4 vectors in R^2, values already at e3 grid so quantization is exact:
  // x = (1, 2), (3, 2), (1, 4), (3, 4) in q-units 1000,2000,...
  private def tiny = Seq(
    Seq(1.0, 2.0), Seq(3.0, 2.0), Seq(1.0, 4.0), Seq(3.0, 4.0))
    .toDF("embedding")

  test("covariance matches the hand computation on a tiny corpus") {
    // q-units: dim0 values {1000,3000}x2 -> mean 2000, var 1e6; dim1
    // {2000,4000}x2 -> var 1e6; the off-diagonal is 0 by symmetry.
    val rows = GramPca.covariance(tiny, "embedding", dim = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows === Set((0, 0, 1000000L), (0, 1, 0L), (1, 1, 1000000L)))
  }

  test("moments are partitioning-independent (merge law)") {
    val one = GramPca.moments(tiny.coalesce(1), "embedding", 2)
    val four = GramPca.moments(tiny.repartition(4), "embedding", 2)
    assert(one.n === four.n)
    assert(one.s.toSeq === four.s.toSeq)
    assert(one.p.toSeq === four.p.toSeq)
  }

  test("malformed rows (null / wrong length) are skipped, not crashed") {
    val df = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(9.0)))
      .toDF("embedding")
    val m = GramPca.moments(df, "embedding", 2)
    assert(m.n === 1L)
    assert(m.s.toSeq === Seq(1000L, 2000L))
  }

  test("applyDelta: incremental maintenance equals recompute exactly") {
    val all = Seq(Seq(1.0, 2.0), Seq(3.0, 2.0), Seq(1.0, 4.0), Seq(3.0, 4.0))
    val base = GramPca.moments(all.take(2).toDF("embedding"), "embedding", 2)
    val ins = GramPca.moments(all.drop(2).toDF("embedding"), "embedding", 2)
    val del = GramPca.moments(all.slice(1, 2).toDF("embedding"), "embedding", 2)
    val got = GramPca.applyDelta(base, ins, del, 2)
    val want = GramPca.moments(
      (all.take(1) ++ all.drop(2)).toDF("embedding"), "embedding", 2)
    assert(got.n === want.n)
    assert(got.s.toSeq === want.s.toSeq)
    assert(got.p.toSeq === want.p.toSeq)
  }

  test("streaming foreachBatch accumulation equals the batch moments") {
    // the moments are additive, so a stream maintains covariance by
    // applyDelta per micro-batch — no state store, no corpus rescans
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Seq[Double]]
    @volatile var acc = GramPca.zero(2)
    val q = input.toDF.toDF("embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc = GramPca.applyDelta(acc,
          GramPca.moments(b, "embedding", 2), GramPca.zero(2), 2)
      }.start()
    try {
      input.addData(Seq(1.0, 2.0), Seq(3.0, 2.0))
      q.processAllAvailable()
      input.addData(Seq(1.0, 4.0), Seq(3.0, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val want = GramPca.moments(tiny, "embedding", 2)
    assert(acc.n === want.n)
    assert(acc.s.toSeq === want.s.toSeq)
    assert(acc.p.toSeq === want.p.toSeq)
  }

  test("power iteration finds the dominant axis of a diagonal matrix") {
    // diag(9, 1): dominant eigenvector is e0; the e1 component decays by
    // 1/9 per round, so after 8 rounds it is < 1 at e6 scale.
    val c = Array(Array(9L, 0L), Array(0L, 1L))
    val v = GramPca.powerIterate(c, rounds = 8)
    assert(math.abs(v(0)) >= 1000000L)
    assert(math.abs(v(1)) < math.abs(v(0)) / 100000L)
  }

  test("pc scores: centered projection matches the hand computation") {
    // tiny corpus covariance = 1e6·I, so power iteration keeps v0's
    // direction: v = (1e6, 1e6). Centers (q-units): (2000, 3000).
    // score((1,2)) = (1000-2000)·1e6 + (2000-3000)·1e6 = -2e9.
    val df = Seq(("a", Seq(1.0, 2.0)), ("b", Seq(3.0, 2.0)),
      ("c", Seq(1.0, 4.0)), ("d", Seq(3.0, 4.0))).toDF("vec_id", "embedding")
    val got = GramPca.pcScores(df, "vec_id", "embedding", 2, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> -2000000000L, "b" -> 0L,
      "c" -> 0L, "d" -> 2000000000L))
  }

  test("NaN elements quantize to 0 (deterministic), never crash") {
    val df = Seq(Seq(Double.NaN, 2.0), Seq(4.0, 2.0)).toDF("embedding")
    val m = GramPca.moments(df, "embedding", 2)
    assert(m.n === 2L)
    assert(m.s.toSeq === Seq(4000L, 4000L)) // NaN -> q = 0
  }

  test("rows with null ELEMENTS are skipped, not decoded into an NPE") {
    val df = Seq(Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(2.0))))
      .toDF("embedding")
    val m = GramPca.moments(df, "embedding", 2)
    assert(m.n === 1L)
    assert(m.s.toSeq === Seq(3000L, 2000L))
  }

  test("deflation exposes the second axis of a diagonal matrix") {
    val c = Array(
      Array(9000000L, 0L, 0L),
      Array(0L, 4000000L, 0L),
      Array(0L, 0L, 1000000L))
    val v1 = GramPca.powerIterate(c, 8)
    assert(math.abs(v1(0)) >= 1000000L) // dominant axis first
    val v2 = GramPca.powerIterate(GramPca.deflate(c, v1), 8)
    assert(math.abs(v2(1)) >= 1000000L, s"second axis, got ${v2.toSeq}")
    assert(math.abs(v2(0)) < math.abs(v2(1)) / 100L)
    assert(math.abs(v2(2)) < math.abs(v2(1)) / 100L)
  }

  test("power iteration is exactly the unrolled integer recurrence") {
    // one round by hand: C = [[2,1],[1,2]], v0 = (1e6, 1e6) ->
    // w = (3e6, 3e6), m = max(1, 3e6/1e6) = 3, v1 = (1e6, 1e6).
    val c = Array(Array(2L, 1L), Array(1L, 2L))
    assert(GramPca.powerIterate(c, 1).toSeq === Seq(1000000L, 1000000L))
  }
}

package graft

/** The `isotonic_calibration` query and its DuckDB oracle both compute the
  * Barlow-Brunk minimax identity — a bug in the IDENTITY itself would be
  * invisible to the cross-engine gate. This spec closes that hole: the
  * fitted curve must equal a sequential pool-adjacent-violators reference
  * (exact BigInt rationals, strict-violation pooling) on real data.
  */
class IsotonicSpec extends SparkSpec {

  test("minimax fit equals sequential pool-adjacent-violators exactly") {
    val out = SparkEntry.queries("isotonic_calibration")(
        spark, "/root/testdata/sf0.001")
      .orderBy("bucket").collect()
    val n = out.map(_.getLong(1))
    val p = out.map(_.getLong(2))
    val got = out.map(_.getLong(4)).toSeq

    // sequential weighted PAVA: sweep left-to-right, pool while the
    // previous block's mean exceeds the current one (exact rationals —
    // cross-multiplied BigInt comparison, never a double)
    val stack = scala.collection.mutable.Stack[(BigInt, BigInt, Int)]()
    for (i <- n.indices) {
      var (cp, cn, cnt) = (BigInt(p(i)), BigInt(n(i)), 1)
      while (stack.nonEmpty &&
          stack.top._1 * cn > cp * stack.top._2) {
        val (tp, tn, tc) = stack.pop()
        cp += tp; cn += tn; cnt += tc
      }
      stack.push((cp, cn, cnt))
    }
    val expected = stack.toList.reverse.flatMap { case (bp, bn, cnt) =>
      Seq.fill(cnt)(((bp * 1000000) / bn).toLong)
    }
    assert(got == expected)
    // and the fit is nondecreasing (what "isotonic" promises)
    assert(got == got.sorted)
  }

  test("Murphy decomposition satisfies brier = rel - res + unc to truncation ulps") {
    val r = SparkEntry.queries("brier_decomposition")(
      spark, "/root/testdata/sf0.001").collect().head
    val (brier, rel, res, unc) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    // each side carries a handful of independent e-12 truncations (the
    // per-bucket and global ō² divs); they bound the identity gap
    assert(math.abs(brier - (rel - res + unc)) <= 70L,
      s"brier=$brier rel=$rel res=$res unc=$unc")
    assert(rel >= 0 && unc >= 0)
  }
}

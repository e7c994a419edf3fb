package graft.operators

import graft.SparkSpec

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("dimStats flags dead dimensions and reports exact extremes") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, -2.0f)),
      (2L, Seq(3.0f, 0.0f, 4.0f)),
      (3L, Seq(2.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorAgg.dimStats(vecs, "embedding")
      .as[(Int, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 3)
    // dim 1 is dead: every value zero
    assert(out(1) == ((1, 3L, 3L, 0.0, 0.0, 0L)))
    assert(out(0) == ((0, 3L, 0L, 1.0, 3.0, 2000000L)))
    // dim 2: mean of (-2, 4, 1) = 1.0
    assert(out(2)._4 == -2.0 && out(2)._5 == 4.0 && out(2)._6 == 1000000L)
  }

  test("dimStats mean is the integer-quantized sum (order-independent)") {
    val vecs = Seq((1L, Seq(0.1f)), (2L, Seq(0.2f))).toDF("vec_id", "embedding")
    val got = VectorAgg.dimStats(vecs, "embedding")
      .as[(Int, Long, Long, Double, Double, Long)].head()
    val exp = math.floor((math.floor(0.1f.toDouble * 1e6 + 0.5)
      + math.floor(0.2f.toDouble * 1e6 + 0.5)) / 2.0 + 0.5).toLong
    assert(got._6 == exp)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.0f, 1.0f, 0.5f, 0.25f)),
    (2L, Seq(-2.0f, 2.0f, 0.0f, 1.0f)),
    (3L, Seq(3.0f, 3.0f, 3.0f, 3.0f))   // constant vector
  ).toDF("vec_id", "embedding")

  test("int8 codes span 0..255 with exact endpoints") {
    val out = Quantize.int8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getSeq[Int](3)))).toMap
    assert(out(1L) == ((0.0, 1.0, Seq(0, 255, 128, 64))))
    assert(out(2L)._3.head == 0 && out(2L)._3(1) == 255)
    assert(out(3L) == ((3.0, 3.0, Seq(0, 0, 0, 0))))
  }

  test("dequantization error is within half a quantization step") {
    val q = Quantize.int8(vecs, "vec_id", "embedding")
    val back = Quantize.dequantInt8(q, "qvec", "q_lo", "q_hi")
      .select(col("vec_id"), col("dequant"))
    val orig = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("o"))
    val joined = back.join(orig, "vec_id").collect()
    joined.foreach { r =>
      val d = r.getSeq[Double](1); val o = r.getSeq[Double](2)
      val step = (o.max - o.min) / 255.0
      d.zip(o).foreach { case (a, b) =>
        assert(math.abs(a - b) <= step / 2 + 1e-12, s"err ${math.abs(a - b)} > ${step / 2}")
      }
    }
  }
}

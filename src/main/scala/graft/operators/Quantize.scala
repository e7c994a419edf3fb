package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (per-vector min/max) int8 quantization of an embedding column —
  * the standard 4× storage/bandwidth cut for ANN indexes (the IVF*,SQ8
  * family in FAISS and friends): each vector stores two doubles (its own
  * min/max) plus one byte per dimension, and reconstructs as
  * `lo + q/255·(hi−lo)` with error ≤ half a quantization step per
  * coordinate.
  *
  * Everything is per-element IEEE arithmetic — no sums, no transcendentals
  * — so quantized codes are bit-identical on any engine (exactly the
  * property the floating-point aggregates lack) and the operator is fully
  * oracle-checkable. The min/max are projected to attributes BEFORE the
  * per-element lambda (inlining `array_min` into `transform` would
  * re-scan the array per element — same discipline as the tokenize-once
  * rule in the text stack). */
object Quantize {

  /** (id, q_lo, q_hi, qvec) with qvec = int codes 0..255 in input order.
    * Constant vectors (hi == lo) quantize to all-zero codes. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), col("__v"),
        array_min(col("__v")).as("q_lo"), array_max(col("__v")).as("q_hi"))
      .select(col(idCol), col("q_lo"), col("q_hi"),
        when(col("q_hi") === col("q_lo"),
          transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"), x =>
            floor((x - col("q_lo")) / (col("q_hi") - col("q_lo")) * 255.0 + 0.5)
              .cast("int")))
          .as("qvec"))

  /** Inverse mapping for [[int8]]: reconstructed array<double>. Max
    * per-coordinate error is (q_hi − q_lo)/510 (half a step). */
  def dequantInt8(df: DataFrame, qCol: String, loCol: String, hiCol: String): DataFrame =
    df.withColumn("dequant",
      transform(col(qCol), q =>
        col(loCol) + q.cast("double") / 255.0 * (col(hiCol) - col(loCol))))
}

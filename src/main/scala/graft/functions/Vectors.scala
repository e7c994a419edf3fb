package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen'd higher-order functions (`zip_with`, `aggregate`) —
  * no UDF serialization boundary, stays inside whole-stage codegen.
  *
  * Accumulation is a sequential left fold in double precision; the DuckDB
  * oracles mirror the same operation order so results are bit-comparable.
  */
object Vectors {

  /** Elementwise dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (||a|| * ||b||).
    * For pairwise workloads prefer precomputing norms once per vector
    * (see [[graft.operators.Similarity]]) — this form recomputes them. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}

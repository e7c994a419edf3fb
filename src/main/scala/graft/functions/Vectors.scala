package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * The dot product — the only per-pair inner loop on the similarity path —
  * is a custom codegen'd Catalyst expression ([[graft.functions.expressions
  * .DotProduct]]): the higher-order `aggregate(zip_with(...))` form is
  * CodegenFallback (interpreted, allocates an intermediate array per pair)
  * and measured orders of magnitude slower on all-pairs workloads.
  *
  * Accumulation is a sequential left fold in double precision; the DuckDB
  * oracles mirror the same operation order so results are bit-comparable.
  */
object Vectors {

  /** Elementwise dot product in double precision (codegen'd loop). */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.DotProduct(
      a.cast("array<double>"), b.cast("array<double>"))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance Σ(a_i−b_i)² (codegen'd loop — the PQ inner
    * kernel; see [[graft.functions.expressions.L2Squared]]). */
  def l2Squared(a: Column, b: Column): Column =
    graft.functions.expressions.L2Squared(
      a.cast("array<double>"), b.cast("array<double>"))

  /** Cosine similarity = dot(a,b) / (||a|| * ||b||).
    * For pairwise workloads prefer precomputing norms once per vector
    * (see [[graft.operators.Similarity]]) — this form recomputes them. */
  /** NULL when either vector has zero norm — matching the guarded cosine
    * in the Similarity operators (ANSI mode would otherwise fail the task
    * on a zero embedding). */
  def cosine(a: Column, b: Column): Column = {
    val prod = l2Norm(a) * l2Norm(b)
    when(prod =!= 0.0, dot(a, b) / prod)
  }
}

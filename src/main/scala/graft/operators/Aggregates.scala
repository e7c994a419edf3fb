package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass `Aggregator` forms of the mode / top-k kernels
  * (SURVEY.md §2.12) — the reference's two pandas per-group lambdas
  * (`/root/reference/dags/music_streaming_etl_dags.py:190-193`, `:204`)
  * as combiner-friendly JVM aggregates.
  *
  * The window formulation in [[GroupTop]] is the default (fully
  * Catalyst-optimized); these exist for (a) Structured Streaming, where a
  * ranking window over a running aggregate isn't expressible, and (b)
  * single-pass pipelines where the extra shuffle of the two-level form
  * matters. Buffer size is bounded by |distinct values in group|, and
  * `merge` is associative+commutative, so partial aggregation (map-side
  * combine) applies — at 100 TB the shuffle carries per-group value→count
  * maps, never raw rows.
  *
  * Tie-break pinned everywhere: (count DESC, value ASC) — identical to
  * [[GroupTop]] and to pandas `mode()[0]`.
  */
object Aggregates {

  private def best(buf: Map[String, Long]): Option[String] =
    if (buf.isEmpty) None
    else Some(buf.minBy { case (v, c) => (-c, v) }._1)

  /** Most frequent non-null value; all-null/empty group → null. */
  class ModeAgg extends Aggregator[String, Map[String, Long], String] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
      small.foldLeft(large) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
    }
    def finish(r: Map[String, Long]): String = best(r).orNull
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Top-k most frequent non-null values, rank-ordered (count DESC, value
    * ASC). Buffer is the full value→count map; the k-cut happens at
    * finish so merge stays exact. */
  class TopKAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
      small.foldLeft(large) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
    }
    def finish(r: Map[String, Long]): Seq[String] =
      r.toSeq.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column-API forms, usable in `df.agg(...)`. */
  import org.apache.spark.sql.functions.udaf
  def mode_agg: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(new ModeAgg, Encoders.STRING)
  def topk_agg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.STRING)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact distributed covariance + top principal component over an
  * embedding column — the one-pass linear-algebra kernel a curation
  * pipeline runs to audit encoder drift (is variance concentrating in a
  * few directions?) before ANN indexing or whitening.
  *
  * Scale shape (the whole point): the corpus is touched ONCE, by a typed
  * `Aggregator` whose buffer is the dim(dim+3)/2+1 sufficient statistics
  * of the covariance — n, per-dimension sums Σq_i, and the upper-triangle
  * second moments Σq_i·q_j. `merge` is element-wise addition
  * (associative + commutative), so partial aggregation applies and the
  * shuffle carries O(dim²) longs per partition, never rows. Everything
  * after that one pass — centering, the power iteration — is O(dim²)
  * model math on the driver, the same bounded-model discipline as the
  * PageRank / NB model stages. A declarative alternative (posexplode +
  * self-join on the row id, as in [[VectorAgg]]'s long form) would
  * shuffle the exploded corpus to co-locate element pairs; at 100 TB that
  * join IS the job, so the Aggregator wins here even though it leaves
  * whole-stage codegen.
  *
  * Portability discipline: elements are e3-quantized
  * (`q = floor(x·1000 + 0.5)`, bit-identical IEEE in both engines), so
  * every statistic is an exact integer. With |x| ≤ ~1, q ≤ ~10³, each
  * product ≤ ~10⁶, and the moment sums stay inside int64 up to ~10¹² rows
  * — the 100 TB envelope. Centering crosses 64 bits transiently
  * (n·Σq_iq_j − Σq_i·Σq_j), carried in `BigInt` driver-side and HUGEINT
  * oracle-side; the emitted per-row covariance `cov_q = that / n²`
  * (truncated toward zero — Scala `BigInt./`, DuckDB `//`, Spark `div`
  * all agree) is back inside q² ≤ ~10⁶ at any corpus size.
  *
  * The power iteration (Mises–Pollaczek-Geiringer; the PageRank kernel on
  * a dense symmetric matrix) runs a FIXED round count in pure int64:
  * w = C·v, then v' = w / max(1, max|w| div 10⁶) keeps v at e6 scale, so
  * |w| ≤ dim·10⁶·2·10⁶ never overflows. Fixed rounds + truncating
  * renormalization make the result bit-identical across engines — the
  * oracle unrolls the same rounds — at the cost of being an R-round
  * power-iteration ESTIMATE of the dominant eigenvector, the standard
  * stopping rule at scale (geometric convergence in λ₂/λ₁).
  */
object GramPca {

  /** n, per-dim sums, upper-triangle products — all in e3 q-units. */
  final case class Moments(n: Long, s: Array[Long], p: Array[Long])

  private final class MomentsAgg(dim: Int)
      extends Aggregator[Seq[Double], Moments, Moments] {
    private val tri = dim * (dim + 1) / 2

    override def zero: Moments =
      Moments(0L, Array.fill(dim)(0L), Array.fill(tri)(0L))

    override def reduce(b: Moments, vec: Seq[Double]): Moments = {
      if (vec == null || vec.length != dim) return b // malformed row: skip
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = math.floor(vec(i) * 1000.0 + 0.5).toLong; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        b.s(i) += q(i)
        var j = i
        while (j < dim) { b.p(k) += q(i) * q(j); k += 1; j += 1 }
        i += 1
      }
      Moments(b.n + 1, b.s, b.p)
    }

    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < tri) { a.p(i) += b.p(i); i += 1 }
      Moments(a.n + b.n, a.s, a.p)
    }

    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Incremental maintenance: the moments of (state + inserts − deletes)
    * without rescanning state — covariance as an INCREMENTALLY VIEWABLE
    * statistic. Because every moment is an exact integer, subtraction is
    * exact too (a float accumulator would drift a little on every retract
    * and never equal a recompute); at 100 TB this is the difference
    * between O(delta) statistics maintenance per CDC batch and a full
    * corpus rescan. Deletes must carry the deleted vector (the MoR-delta
    * convention — the feed, not the state, supplies the old image). */
  def applyDelta(state: Moments, inserts: Moments, deletes: Moments,
      dim: Int): Moments = {
    val tri = dim * (dim + 1) / 2
    val s = new Array[Long](dim)
    val p = new Array[Long](tri)
    var i = 0
    while (i < dim) { s(i) = state.s(i) + inserts.s(i) - deletes.s(i); i += 1 }
    i = 0
    while (i < tri) { p(i) = state.p(i) + inserts.p(i) - deletes.p(i); i += 1 }
    Moments(state.n + inserts.n - deletes.n, s, p)
  }

  /** One distributed pass → the exact integer moments. Malformed rows —
    * null vector, wrong length, or any null ELEMENT (which the primitive
    * `Seq[Double]` decode could not even represent) — are skipped, the
    * same dense-vector contract as the ANN tier. */
  def moments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(vecCol).cast("array<double>")
    val rows = df
      .select(v.as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), x => x.isNull))
      .as[Seq[Double]]
      .select(new MomentsAgg(dim).toColumn)
      .collect() // exactly one row: the O(dim²) sufficient statistics
    rows.head
  }

  /** Centered covariance in q-units, full dim×dim symmetric matrix.
    * covQ(i)(j) = (n·Σq_iq_j − Σq_i·Σq_j) / n², truncated toward zero. */
  def covarianceQ(m: Moments, dim: Int): Array[Array[Long]] = {
    require(m.n > 0, "covariance of an empty corpus")
    val n = BigInt(m.n)
    val c = Array.ofDim[Long](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = ((n * m.p(k) - BigInt(m.s(i)) * m.s(j)) / (n * n)).toLong
        c(i)(j) = v
        c(j)(i) = v
        k += 1
        j += 1
      }
      i += 1
    }
    c
  }

  /** All-zero moments — the identity of [[applyDelta]]. */
  def zero(dim: Int): Moments =
    Moments(0L, Array.fill(dim)(0L), Array.fill(dim * (dim + 1) / 2)(0L))

  /** Upper-triangle covariance rows (i, j, cov_q), i ≤ j, 0-based. */
  def covarianceRows(spark: SparkSession, m: Moments, dim: Int): DataFrame = {
    import spark.implicits._
    val c = covarianceQ(m, dim)
    (for (i <- 0 until dim; j <- i until dim) yield (i, j, c(i)(j)))
      .toDF("i", "j", "cov_q")
  }

  /** Upper-triangle covariance as rows (i, j, cov_q), i ≤ j, 0-based. */
  def covariance(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    covarianceRows(df.sparkSession, moments(df, vecCol, dim), dim)

  /** `rounds` integer power-iteration steps from v₀ = [10⁶,…]; returns
    * the e6-scale direction estimate. Deterministic: int64 matvec +
    * truncating renormalization, no floats anywhere. */
  def powerIterate(c: Array[Array[Long]], rounds: Int): Array[Long] = {
    val dim = c.length
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to rounds) {
      val w = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var acc = 0L
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val m = math.max(1L, w.map(math.abs).max / 1000000L)
      v = w.map(_ / m)
    }
    v
  }

  /** Dominant-direction report: (pos, var_q, pc_scaled) per dimension —
    * the exact per-dimension variance next to the R-round power-iteration
    * loading, the two columns an encoder-drift audit reads together. */
  def topPc(df: DataFrame, vecCol: String, dim: Int, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = covarianceQ(moments(df, vecCol, dim), dim)
    val v = powerIterate(c, rounds)
    (0 until dim).map(i => (i, c(i)(i), v(i))).toDF("pos", "var_q", "pc_scaled")
  }

  /** Hotelling deflation in exact integers: C₂ = C − λ·v·vᵀ/(vᵀv) with
    * λ = vᵀCv/(vᵀv), i.e. per entry C₂ᵢⱼ = Cᵢⱼ − (vᵀCv)·vᵢ·vⱼ/(vᵀv)² —
    * numerator and denominator carried in BigInt (vᵀCv ≈ 10²⁰ crosses 64
    * bits), one truncation toward zero per entry, mirrored verbatim by
    * the oracle's HUGEINT `//`. Entries stay ≤ ~λ ≤ trace(C), so the
    * following power iteration's int64 budget still holds. */
  def deflate(c: Array[Array[Long]], v: Array[Long]): Array[Array[Long]] = {
    val dim = c.length
    val w = Array.tabulate(dim)(i =>
      (0 until dim).map(j => BigInt(c(i)(j)) * v(j)).sum)
    val lam = (0 until dim).map(i => w(i) * v(i)).sum // vᵀCv
    val vtv = v.map(x => BigInt(x) * x).sum
    require(vtv > 0, "deflation of a zero direction")
    val den = vtv * vtv
    Array.tabulate(dim, dim)((i, j) =>
      (BigInt(c(i)(j)) - (lam * v(i) * v(j)) / den).toLong)
  }

  /** Second principal direction: deflate the dominant one out, iterate
    * again — (pos, pc2_scaled). With [[topPc]] this spans the top-2
    * subspace an embedding-drift monitor projects onto. */
  def topPc2(df: DataFrame, vecCol: String, dim: Int, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = covarianceQ(moments(df, vecCol, dim), dim)
    val v2 = powerIterate(deflate(c, powerIterate(c, rounds)), rounds)
    v2.toSeq.zipWithIndex.map { case (x, i) => (i, x) }.toDF("pos", "pc2_scaled")
  }

  /** Per-vector coordinate along the dominant direction:
    * score_q = Σ_j (q_j − c_j)·v_j with c_j = Σq_j/n (truncated) — the
    * outlier/drift score an embedding audit ranks by. The model (center +
    * direction) is built by the same one-pass moments + bounded iteration,
    * then re-enters the plan as two LITERAL arrays, so the scoring pass is
    * a zero-shuffle zip_with/aggregate projection — pure whole-stage
    * codegen, embarrassingly parallel at any corpus size. |q−c| ≤ ~2·10³
    * and |v| ≤ ~2·10⁶ keep the 64-term dot inside int64 with 10⁴× room. */
  def pcScores(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      rounds: Int): DataFrame = {
    val m = moments(df, vecCol, dim)
    val v = powerIterate(covarianceQ(m, dim), rounds)
    val center = m.s.map(_ / m.n)
    // Σ(q−c)·v = Σq·v − Σc·v: the center term is a CONSTANT, folded
    // driver-side, so the per-row work is one native codegen'd long dot
    // (LongDot — the HOF zip_with/aggregate form interprets its lambdas)
    val centerDot = center.zip(v).map { case (c, w) => c * w }.sum
    val vLit = array(v.map(lit): _*)
    val q = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1000.0) + lit(0.5)).cast("long"))
    df.select(col(idCol),
      (graft.functions.expressions.LongDot(q, vLit) - lit(centerDot))
        .as("score_q"))
  }
}

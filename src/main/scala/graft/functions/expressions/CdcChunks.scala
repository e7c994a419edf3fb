package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR: content-defined chunks of a token array in
  * ONE streaming pass — the codegen-family replacement for the interpreted
  * HOF boundary scan that [[graft.operators.Chunking.contentDefinedChunks]]
  * previously built from `filter(sequence(...), i => md5(concat_ws(
  * slice(...))))`.
  *
  * Boundary rule (Muth-Manber anchoring at token granularity, as in
  * LBFS/rsync/FastCDC): cut after token `i` (1-based) whenever the
  * `w`-token window ending at `i` hashes to `0 mod divisor`; the document
  * end is always a cut; docs shorter than `w` tokens are one whole-doc
  * chunk. Expected chunk length ≈ `divisor` tokens, geometric.
  *
  * The window hash is a degree-(w−1) polynomial over PER-TOKEN 60-bit
  * md5-derived values (the [[graft.functions.PortableHash]] discipline, so
  * a SQL oracle reproduces every cut with HUGEINT arithmetic):
  *
  *     H(i) = ( Σ_{j=0}^{w−1}  h60(tok[i−j]) · M^j )  mod 2^60
  *
  * with M = [[CdcChunks.Mult]] (an odd 60-bit multiply-shift constant —
  * odd ⇒ a bijection mod 2^60, so token hashes can't collapse). Because
  * 2^60 divides 2^64, every mod-2^60 step is wrapping 64-bit arithmetic
  * plus one mask, and the window hash ROLLS in O(1) per token:
  *
  *     H' = ( H·M + h_in − h_out·(M^w mod 2^60) ) mod 2^60
  *
  * So the per-token cost is one md5 of the TOKEN (not of the O(w)
  * window concatenation) plus constant arithmetic — the same
  * native-generator + rolling-hash pattern proven ~10× on the
  * decontamination path (DistinctGrams + hashed join).
  *
  * Output rows: (chunk_idx int, n_toks long, chunk string) with `chunk`
  * the space-joined token window (null tokens skipped by
  * `UTF8String.concatWs`; a null token's hash is the empty string's —
  * token arrays from `split` never contain nulls). The md5 CHUNK
  * fingerprint stays a downstream codegen'd `md5(chunk)` projection, so
  * the dedup-join key is unchanged and oracle-portable.
  *
  * Memory per row: a `w`-long ring buffer + the cut-position buffer
  * (≈ n/divisor ints) — strictly less than the HOF form's transient
  * window arrays; chunks stream out one at a time through `GenerateExec`.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("n_toks", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 && divisor >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks requires w >= 1 and divisor >= 2, got w=$w divisor=$divisor")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks requires array<string>, got ${other.catalogString}")
  }

  // one digest instance per task thread, reset per token — never per call
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val multPowW = CdcChunks.powerMod(w)

  /** h60 of one token: first 60 bits of md5(UTF-8 bytes) — identical to
    * [[graft.functions.PortableHash.hash60]]'s 15-hex-char value. */
  private def tokenHash(t: UTF8String): Long = {
    digest.reset()
    val d = digest.digest(if (t == null) Array.emptyByteArray else t.getBytes)
    val top8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top8 >>> 4
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      // pass 1: cut positions (1-based; the doc end is always a cut)
      val cuts = new scala.collection.mutable.ArrayBuffer[Int](n / divisor + 2)
      if (n >= w) {
        val ring = new Array[Long](w)
        var h = 0L
        var i = 0
        while (i < n) {
          val t = tokenHash(arr.getUTF8String(i))
          // wrapping 64-bit ops then mask ≡ exact mod 2^60 (2^60 | 2^64)
          h =
            if (i < w) (h * CdcChunks.Mult + t) & CdcChunks.Mask // Horner warm-up
            else (h * CdcChunks.Mult + t - ring(i % w) * multPowW) & CdcChunks.Mask
          ring(i % w) = t
          if (i >= w - 1 && h % divisor == 0) cuts += (i + 1)
          i += 1
        }
      }
      if (cuts.isEmpty || cuts(cuts.length - 1) != n) cuts += n
      // pass 2: stream one chunk per consecutive cut pair
      Iterator.tabulate(cuts.length) { k =>
        val prev = if (k == 0) 0 else cuts(k - 1)
        val cut = cuts(k)
        val parts = new Array[UTF8String](cut - prev)
        var j = prev
        while (j < cut) { parts(j - prev) = arr.getUTF8String(j); j += 1 }
        InternalRow(k, (cut - prev).toLong,
          UTF8String.concatWs(WindowGrams.Space, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {

  /** Mod-2^60 mask: `x & Mask` ≡ `x mod 2^60` for wrapping-long `x`. */
  val Mask: Long = (1L << 60) - 1

  /** The rolling multiplier: member 0 of the multiply-shift family —
    * odd, 60-bit, shared verbatim with the SQL oracle's coefficient
    * table via [[powerMod]]. */
  val Mult: Long = graft.functions.PortableHash.multiplier(0)

  /** M^j mod 2^60 — the oracle-side polynomial coefficients. */
  def powerMod(j: Int): Long = {
    var acc = 1L
    var i = 0
    while (i < j) { acc = (acc * Mult) & Mask; i += 1 }
    acc
  }

  /** (chunk_idx int, n_toks long, chunk string) generator column. */
  def chunks(tokens: Column, w: Int, divisor: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(tokens), w, divisor))
  }
}

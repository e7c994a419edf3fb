package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit hash family, for operators whose CORRECTNESS
  * oracle must reproduce the hash in DuckDB.
  *
  * The default hash for the dedup/similarity operators is `xxhash64`
  * (fastest, codegen'd) — but DuckDB has no xxhash, so queries built on it
  * can only be rows/schema-checked. This family derives a 60-bit
  * non-negative value from `md5`, which both engines implement identically
  * over UTF-8 bytes:
  *
  *  - Spark:  `conv(substr(md5(x), 1, 15), 16, 10)` cast to long
  *  - DuckDB: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`
  *
  * 15 hex chars = 60 bits, always within a positive signed 64-bit range on
  * both sides (the 16th char would risk sign disagreement). Seeded variants
  * prefix `"<seed>:"` to the input, giving independent functions per seed —
  * the same construction [[graft.operators.Sampling]] uses for its stable
  * buckets (there with 24 bits).
  *
  * Cost: one md5 per (seed, value) — measurably slower than xxhash64, so
  * operators take the family as a parameter and default to xxhash64; the
  * registered driver queries opt into the portable family to get a
  * hash-match oracle.
  */
object PortableHash {

  /** Number of bits produced — 15 hex chars. */
  val Bits = 60

  private val Mask = (1L << Bits) - 1

  /** 60-bit non-negative hash of a column (cast to string first). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent function per seed, prefixing the input.
    * Costs one md5 PER SEED — for families of many seeded functions over
    * the same value (MinHash), use [[family60]], which hashes once. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic odd multiplier for family member `i` (splitmix64 mix,
    * forced odd, truncated to 60 bits) — multiplication by an odd constant
    * is a bijection mod 2^60, the classic multiply-shift universal family
    * (Dietzfelbinger et al., J. Algorithms 1997). */
  def multiplier(i: Int): Long = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Mask | 1L
  }

  /** Member `i` of a multiply-shift family over an ALREADY-HASHED 60-bit
    * column `h` (from [[hash60]]): (m_i · h + i) mod 2^60. ONE md5 total
    * for any family size — this is what makes a 64-function MinHash
    * affordable (64 md5s per shingle measured ~15× slower end-to-end).
    *
    * Cross-engine note: the JVM side computes m·h with wrapping 64-bit
    * multiply then masks to 60 bits (via the codegen
    * [[graft.functions.expressions.MultiplyShift]] — Spark 4's ANSI-mode
    * `*` throws on overflow); because 2^60 divides 2^64, that equals the
    * exact (m·h + i) mod 2^60 DuckDB computes via HUGEINT
    * ([[duckdbFamilySql]]) — both operands are non-negative on both sides. */
  def family60(h: Column, i: Int): Column =
    graft.functions.expressions.MultiplyShift(h, multiplier(i), i.toLong, Mask)

  /** DuckDB SQL mirroring [[hash60]] over SQL expression `e` (must already
    * be VARCHAR on the DuckDB side). */
  def duckdbSql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB SQL mirroring the seeded [[hash60]]. */
  def duckdbSql(e: String, seed: Int): String =
    duckdbSql(s"'$seed:' || $e")

  /** DuckDB SQL mirroring [[family60]]: `h`, `mult`, `i` are SQL
    * expressions (columns or literals). BIGINT multiply would overflow —
    * HUGEINT keeps the product exact, and % 2^60 of the non-negative
    * product equals Spark's masked wrapping arithmetic. */
  def duckdbFamilySql(h: String, mult: String, i: String): String =
    s"CAST((CAST($h AS HUGEINT) * $mult + $i) % ${1L << Bits} AS BIGINT)"
}

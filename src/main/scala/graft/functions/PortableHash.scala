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

  /** 60-bit non-negative hash of a column (cast to string first). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent function per seed. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** DuckDB SQL mirroring [[hash60]] over SQL expression `e` (must already
    * be VARCHAR on the DuckDB side). */
  def duckdbSql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB SQL mirroring the seeded [[hash60]]. */
  def duckdbSql(e: String, seed: Int): String =
    duckdbSql(s"'$seed:' || $e")
}

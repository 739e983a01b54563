package graft.ext

import org.apache.spark.sql.Column

import graft.functions.Md5Prefix.md5Prefix

/** Engine-portable deterministic hashing.
  *
  * Both Spark and DuckDB implement MD5 identically, so
  * `first-k-hex-chars(md5(x)) → bigint` is a hash both engines compute
  * bit-equal — the foundation that lets MinHash/SimHash/fingerprint
  * results be oracle-checked across engines (Spark's own `hash()` /
  * `xxhash64` and DuckDB's `hash()` are different algorithms).
  *
  * Implemented by the native [[graft.functions.Md5Prefix]] expression:
  * digest nibbles go straight to a long inside whole-stage codegen.
  * The built-in formulation (`conv(substring(md5(x),1,k),16,10)`) is
  * value-identical but ~5× slower — it materializes and re-parses a
  * 32-char hex string per hash (PropertySpec pins the bit-equality).
  *
  * Scale note: at 100 TB the hash work stays inside whole-stage
  * codegen with no UDF boundary and no per-row allocation beyond the
  * 16-byte digest.
  */
object Hashing {
  /** 32-bit hash of a string column as a non-negative BIGINT.
    * DuckDB twin: `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`.
    */
  def h32(c: Column): Column = md5Prefix(c, 8)

  /** 60-bit hash (15 hex chars — stays within BIGINT in both engines).
    * DuckDB twin: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    */
  def h60(c: Column): Column = md5Prefix(c, 15)

  /** The i-th universal-hash permutation of a base hash, matching
    * `((2*i+3)*h + (5*i+7)) % 2147483647` on the DuckDB side.
    * `i` may be a column (one row per permutation index).
    */
  def permute(h: Column, i: Column): Column =
    ((i * 2 + 3) * h + (i * 5 + 7)) % 2147483647L
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable hash columns. The md5 hex slices are the ONE
  * digest idiom the whole engine keys/shuffles/buckets on, so the bit
  * bounds live in exactly one place:
  *
  *  - ≤15 hex chars (60 bits) keeps the value positive inside a signed
  *    64-bit int in every engine — Spark's `conv` would wrap 16 chars
  *    silently while DuckDB's `CAST('0x…' AS BIGINT)` errors, and the
  *    headroom lets callers scale/sum digests without overflow (DuckDB
  *    errors on bigint overflow; Spark wraps).
  *  - DuckDB equivalent: `CAST('0x' || substr(md5(x), A, N) AS BIGINT)`.
  */
object Hashing {

  /** First 60 bits of md5(c) as a non-negative long. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 52 further bits (hex chars 17-29) of md5(c) — an independent second
    * hash for tabulation families, small enough that `h1 + j*h2` stays
    * inside 63 bits for small j.
    */
  def md5Long52(c: Column): Column =
    conv(substring(md5(c), 17, 13), 16, 10).cast("long")
}

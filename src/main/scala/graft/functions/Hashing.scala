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

  private def bridge = org.apache.spark.sql.graft.bridge

  /** First 60 bits of md5(c) as a non-negative long. Computed by the
    * codegen'd [[graft.expressions.Md5Long60]] digest-byte slice —
    * bit-identical to `conv(substring(md5(c), 1, 15), 16, 10)` without
    * the hex format/parse round trip (differential-spec pinned).
    */
  def md5Long60(c: Column): Column =
    bridge.column(graft.expressions.Md5Long60(bridge.expression(c)))

  /** 52 further bits (hex chars 17-29) of md5(c) — an independent second
    * hash for rotation families.
    */
  def md5Long52(c: Column): Column =
    bridge.column(graft.expressions.Md5Long52(bridge.expression(c)))

  /** Both sub-hashes as struct<h60, h52> from ONE digest computation —
    * use when a row needs both (two separate calls hash twice).
    */
  def md5Pair(c: Column): Column =
    bridge.column(graft.expressions.Md5Pair(bridge.expression(c)))

  /** Raw 16-byte digest; unsigned binary order ≡ hex-string order, so
    * min/max aggregates can run on bytes and format hex once per group.
    */
  def md5Binary(c: Column): Column =
    bridge.column(graft.expressions.Md5Binary(bridge.expression(c)))
}

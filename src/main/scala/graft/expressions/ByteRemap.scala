package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-to-unicode remap — the GPT-2 `bytes_to_unicode` table
  * (Radford et al. 2019; openai/gpt-2 encoder.py): every UTF-8 BYTE of
  * the input maps to one printable unicode character, so a downstream
  * byte-level BPE can treat characters of the remapped string as its
  * byte alphabet with no unprintable or whitespace symbols. Printable
  * bytes keep their own codepoint (`!`..`~`, `¡`..`¬`, `®`..`ÿ`); the
  * 68 excluded bytes (controls, space, DEL, soft hyphen, …) map to
  * `256 + n` in ascending byte order — hence space (0x20, the 33rd
  * excluded byte counting from 0) becomes `Ġ` (U+0120), the leading
  * marker every GPT-2-family vocabulary shows.
  *
  * Total and injective over all 256 byte values — ANY input string
  * remaps losslessly (that is the point of byte-fallback: no `[UNK]`),
  * and `length(remapped)` = UTF-8 byte count of the input.
  */
case class ByteRemap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_remap"

  override def nullSafeEval(s: Any): Any =
    ByteRemap.remap(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ByteRemap.remap($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteRemap =
    copy(child = newChild)
}

/** The exact inverse of [[ByteRemap]] — detokenization's last step:
  * each mapped character (codepoint < 324 by construction) turns back
  * into its original byte, so `unmap(remap(s)) = s` for EVERY byte
  * sequence.
  *
  * Strict by default: characters outside the table's image raise (they
  * cannot have come from [[ByteRemap]]) rather than decoding garbage —
  * the right contract for engine-internal round trips, where a stray
  * codepoint is a BUG upstream. That contract is only safe when the
  * input provably came from [[ByteRemap]]; for ad-hoc SQL over
  * arbitrary columns one bad row would fail the whole task/stage, so
  * `lenient = true` returns NULL on invalid input instead (the repo's
  * PERMISSIVE/quarantine convention for user-facing decode surfaces) —
  * registered as `graft_byte_unmap_lenient` next to the strict
  * `graft_byte_unmap`.
  */
case class ByteUnmap(child: Expression, lenient: Boolean = false)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = lenient || super.nullable
  override def prettyName: String =
    if (lenient) "graft_byte_unmap_lenient" else "graft_byte_unmap"

  override def nullSafeEval(s: Any): Any =
    if (lenient) ByteRemap.unmapOrNull(s.asInstanceOf[UTF8String])
    else ByteRemap.unmap(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (lenient) {
      // Null-producing codegen: defineCodeGen can't emit a null result,
      // so wire isNull to the helper's null return explicitly.
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val code =
        code"""
          ${c.code}
          boolean ${ev.isNull} = ${c.isNull};
          UTF8String ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = graft.expressions.ByteRemap.unmapOrNull(${c.value});
            ${ev.isNull} = ${ev.value} == null;
          }
        """
      ev.copy(code = code)
    } else {
      defineCodeGen(ctx, ev, c => s"graft.expressions.ByteRemap.unmap($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): ByteUnmap =
    copy(child = newChild)
}

object ByteRemap {

  /** byte value → mapped char, the exact GPT-2 construction: kept bytes
    * map to themselves, excluded bytes to 256+n in ascending order.
    */
  val table: Array[Char] = {
    val t = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val kept = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (kept) t(b) = b.toChar
      else { t(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    t
  }

  /** char → original byte; -1 marks codepoints no remap can produce. */
  val inverse: Array[Int] = {
    val inv = Array.fill(324)(-1) // table chars top out at 255 + 68 = 323
    var b = 0
    while (b < 256) { inv(table(b).toInt) = b; b += 1 }
    inv
  }

  def unmap(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      val b = if (c < inverse.length) inverse(c) else -1
      require(b >= 0, f"codepoint U+$c%04X is not in the byte-remap image")
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** [[unmap]] returning null instead of raising on codepoints outside
    * the remap image — the lenient SQL surface's helper (one stray row
    * must not fail a corpus-scale scan).
    */
  def unmapOrNull(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      val b = if (c < inverse.length) inverse(c) else -1
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Static entry shared by interpreted eval and generated code. */
  def remap(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(table(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

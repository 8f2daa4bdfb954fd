package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whitespace tokenizer: maximal runs of non-whitespace bytes of
  * a trimmed string, `[""]` when no token exists.
  *
  * Why an expression: `split` with a `\s+` pattern routes each document
  * through java.util.regex (measured +67% on the shingle-heavy fingerprint
  * query at sf0.1 versus the previous literal-space split); this is a
  * single forward byte scan with no regex machinery, and the token slices
  * share the parent string's byte array.
  *
  * The whitespace set is RE2's `\s` = `[ \t\n\f\r]` — matching the DuckDB
  * oracles' `regexp_split_to_array(trim(text), '\s+')` exactly. NOTE this
  * deliberately EXCLUDES vertical tab 0x0B, which Java's `\s` includes
  * and RE2's does not; the engine sides with the oracle's semantics so
  * the gate holds on any input. Multi-byte UTF-8 code points never
  * contain ASCII bytes, so the byte scan is UTF-8-safe.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(s: Any): Any =
    WhitespaceTokens.split(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WhitespaceTokens.split($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {

  /** Static entry shared by interpreted eval and generated code. */
  def split(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    if (out.isEmpty) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    else new GenericArrayData(out.toArray)
  }

  // RE2 \s: space, \t, \n, \f, \r — NOT vertical tab 0x0B (see scaladoc).
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d
}

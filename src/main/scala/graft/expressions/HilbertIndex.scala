package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd Hilbert index of two nonnegative `bits`-bit long
  * coordinates — the standard per-level quadrant walk (Wikipedia xy2d):
  * at each level the quadrant pair contributes `s²·((3·rx) XOR ry)` and
  * the frame reflects-by-`n−1`-then-swaps for the levels below when
  * `ry = 0`.
  *
  * Why an expression and not composed `Column`s: the walk's rotation
  * state makes each level a conditional over the previous level's
  * coordinates, so a declarative formulation is `bits` chained CASE
  * projections — and that plan OOM'd a 1 GiB driver JVM at bits = 21
  * (Catalyst/codegen work on the 21-deep non-cheap-expression chain,
  * observed as q191's "Java heap space" in the Verify gate). Here the
  * whole walk is one tight primitive loop inside whole-stage codegen:
  * constant plan size, no allocation, ~`bits` iterations per row.
  *
  * Null behavior matches the built-ins (null in → null out); inputs are
  * assumed in `[0, 2^bits)` — the same nonnegative-domain contract the
  * Z-order interleave documents.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of range [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  private val n: Long = 1L << bits

  override def nullSafeEval(a: Any, b: Any): Any = {
    var hx = a.asInstanceOf[Long]
    var hy = b.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { hx = n - 1L - hx; hy = n - 1L - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $hx = $a;
         |long $hy = $b;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($hx & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($hy & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = ${n}L - 1L - $hx; $hy = ${n}L - 1L - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

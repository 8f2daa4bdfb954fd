package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** d-dimensional Hilbert index of `d` nonnegative `bits`-bit long
  * coordinates — Skilling's transpose algorithm ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004): an inverse-undo sweep
  * from the top bit plane down (per plane, per axis: reflect axis 0 or
  * swap-mask against it), a Gray encode across axes, a parity fix-up
  * from the last axis, then the index is the bit-plane transpose
  * (axis 0 most significant within each plane). The 2-D
  * [[HilbertIndex]] keeps the classic xy2d walk for the existing
  * layout audits; this is the d>2 generalization (`OPTIMIZE ZORDER`-
  * style clustering on 3-4 columns wants the continuous linearization
  * too — Hilbert's adjacent-cells property is dimension-generic).
  *
  * One tight primitive loop per row (O(d·bits)), no allocation beyond a
  * d-length scratch array; null in any dimension → null out; inputs
  * assumed in `[0, 2^bits)` like the Morton/Hilbert siblings.
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression {

  private val d = children.size
  require(d >= 2, "HilbertIndexN requires at least two dimensions")
  require(bits >= 1 && d.toLong * bits <= 63,
    s"bits=$bits × dims=$d exceeds the 63-bit nonnegative long key space")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_hilbert_n"

  override def eval(input: InternalRow): Any = {
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      x(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndexN.compute(x, bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val arr = ctx.freshName("hx")
    val childGens = children.map(_.genCode(ctx))
    val loads = childGens.zipWithIndex.map { case (cg, i) =>
      val guard =
        if (children(i).nullable) s"if (${cg.isNull}) { ${ev.isNull} = true; }"
        else ""
      code"""
        |${cg.code}
        |$guard
        |$arr[$i] = ${cg.isNull} ? 0L : (long) ${cg.value};""".stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long[] $arr = new long[$d];
        |$loads
        |long ${ev.value} = ${ev.isNull}
        |  ? 0L : graft.expressions.HilbertIndexN.compute($arr, $bits);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)
}

object HilbertIndexN {

  /** Skilling AxesToTranspose + bit-plane interleave. Mutates `x`. */
  def compute(x: Array[Long], bits: Int): Long = {
    val n = x.length
    val m = 1L << (bits - 1)
    // Inverse undo: top plane down to plane 1.
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode (each axis against the updated previous one).
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    // Parity fix-up from the last axis.
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Transpose: bit l of axis i lands at index position l·n + (n−1−i)
    // — axis 0 most significant within each plane.
    var h = 0L
    var l = 0
    while (l < bits) {
      i = 0
      while (i < n) {
        h |= ((x(i) >> l) & 1L) << (l * n + (n - 1 - i))
        i += 1
      }
      l += 1
    }
    h
  }
}

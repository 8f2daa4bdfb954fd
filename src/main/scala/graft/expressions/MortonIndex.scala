package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd d-dimensional Morton (Z-order) interleave of `d`
  * nonnegative `bits`-bit long coordinates: bit `i` of dimension `j`
  * lands at output position `i·d + j`, so for the 2-D case dimension 0
  * occupies the even bit positions and dimension 1 the odd ones — the
  * exact layout `OPTIMIZE ZORDER BY` clusters on and the same key the
  * earlier SQL-text formulation produced
  * (`aggregate(sequence(0, bits-1), ...)`), kept bit-identical so the
  * DuckDB oracle's independent `list_transform` replay still matches.
  *
  * Why an expression and not the higher-order-function SQL: Spark's
  * `aggregate` lambda is a non-codegen `HigherOrderFunction`, so each
  * row paid a `bits`-step interpreted fold — and `CollapseProject`
  * happily duplicates the whole fold into every consumer (measured in
  * the layout audit: the 21-step fold ran ~31× per row inside the
  * bucket-boundary filter lambda, 70–82 s where the byte-identical
  * Hilbert machinery with a codegen'd key ran 3.7 s). Here the
  * interleave is one tight primitive loop inside whole-stage codegen:
  * constant plan size, no allocation, `bits` iterations per row no
  * matter how many consumers Catalyst folds it into.
  *
  * Null behavior matches the built-ins (any null in → null out);
  * inputs are assumed in `[0, 2^bits)` — the same nonnegative-domain
  * contract the Hilbert index documents.
  */
case class MortonIndex(children: Seq[Expression], bits: Int)
    extends Expression {

  private val d = children.size
  require(d >= 1, "MortonIndex requires at least one dimension")
  require(bits >= 1 && d.toLong * bits <= 63,
    s"bits=$bits × dims=$d exceeds the 63-bit nonnegative long key space")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_morton"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < d) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1L) << (i * d + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val z = ctx.freshName("z")
    val childGens = children.map(_.genCode(ctx))
    val spread = childGens.zipWithIndex.map { case (cg, j) =>
      val i = ctx.freshName("i")
      val nullGuard =
        if (children(j).nullable) s"if (${cg.isNull}) { ${ev.isNull} = true; } else"
        else ""
      code"""
        |${cg.code}
        |$nullGuard {
        |  for (int $i = 0; $i < $bits; $i++) {
        |    $z |= ((${cg.value} >> $i) & 1L) << ($i * $d + $j);
        |  }
        |}""".stripMargin
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long $z = 0L;
        |$spread
        |long ${ev.value} = $z;""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonIndex =
    copy(children = newChildren)
}

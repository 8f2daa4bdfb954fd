package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE encode: replay a trained merge table (rank order,
  * left-to-right greedy non-overlapping — the standard BPE apply rule)
  * over one word, returning its subword pieces.
  *
  * The merge table is part of the EXPRESSION, not a column: it is the
  * trained model (small, driver-held, identical for every row), shipped
  * once per task through the codegen reference array rather than
  * serialized per row. SQL surface: `graft_bpe_encode(w,
  * array(array('t','h'), array('th','e')))` — the second argument must
  * be a foldable array-of-2-element-string-arrays in rank order.
  *
  * Character splitting uses UTF-16 code units (Java `String` chars),
  * matching the trainer's vocabulary splitting in
  * [[graft.functions.TextAnalysis.bpeTrainMerges]] — trainer and
  * encoder must agree on the symbol alphabet or replay diverges.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  // Flat (a, b, ab) triples so the hot loop never concatenates strings.
  private lazy val table: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b, a + b) }.toArray

  override def nullSafeEval(s: Any): Any =
    BpeEncode.encode(s.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.BpeEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Static entry shared by interpreted eval and generated code. */
  def encode(w: UTF8String, merges: Array[Array[String]]): GenericArrayData = {
    val s = w.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) { syms.add(String.valueOf(s.charAt(i))); i += 1 }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      val ab = merges(m)(2)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(ab); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document word n-gram statistics in one fused pass:
  * struct<n_grams, n_distinct_grams, top_gram_cnt>, null when the doc has
  * fewer than n words. Grams are counted under a 64-bit mixed hash of the
  * member words' xxh64 values — the scoring needs counts, never a winning
  * gram's text, so (as with the shuffle-keyed formulation this replaces)
  * counts are exact up to ~grams²/2^64 intra-document collisions.
  *
  * Replaces an explode of every gram plus two aggregations: the counting
  * is doc-local by definition, so a per-row hash map (bounded by the
  * document's distinct grams) does all of it with zero shuffle rows.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("top_gram_cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_stats"
  override def nullSafeEval(a: Any): Any =
    GramStats.compute(a.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.GramStats.compute($c, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {

  // Named `compute`, not `eval`: the companion case class inherits
  // Expression.eval, which suppresses the static forwarder an `eval`
  // object method would need for the generated code to link.
  def compute(words: ArrayData, n: Int): InternalRow = {
    val w = words.numElements()
    if (w < n) return null
    // xxh64 each word once; gram key mixes the n member hashes.
    val wh = new Array[Long](w)
    var i = 0
    while (i < w) {
      val s = words.getUTF8String(i)
      wh(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val counts = new java.util.HashMap[java.lang.Long, Long](64)
    val grams = w - n + 1
    i = 0
    while (i < grams) {
      var k = wh(i)
      var j = 1
      while (j < n) {
        k = java.lang.Long.rotateLeft(k, 23) * -0x61c8864680b583ebL + wh(i + j)
        j += 1
      }
      counts.merge(k, 1L, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
    }
    new GenericInternalRow(Array[Any](grams.toLong, counts.size.toLong, top))
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd unigram-LM (SentencePiece-style) encode: Viterbi-segment one
  * word under a trained piece-cost table, returning the minimum-cost
  * piece sequence. The segmentation minimizes, lexicographically,
  * `(total integer cost, piece count, U+001F-joined piece path)` — the
  * third key resolves every remaining tie deterministically (two distinct
  * segmentations of the same prefix with equal piece counts have
  * equal-length paths whose first difference is a separator vs a
  * character, so prefix-extension preserves the order and the DP
  * recurrence stays exact). All-ASCII corpora make the Java UTF-16
  * comparison here agree byte-for-byte with the engines' UTF-8 binary
  * collation.
  *
  * Like [[BpeEncode]], the model (piece → whole-bit surprisal cost) is
  * part of the EXPRESSION — small, driver-held, shipped once per task via
  * the codegen reference array. The cost table must contain every single
  * character of the input (the trainer guarantees it: characters are
  * never pruned), which makes every position reachable.
  */
case class UnigramEncode(child: Expression, vocabCosts: Seq[(String, Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_encode"

  private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocabCosts.size * 2)
    vocabCosts.foreach { case (p, c) => m.put(p, c) }
    m
  }

  private lazy val maxPieceLen: Int =
    if (vocabCosts.isEmpty) 1 else vocabCosts.map(_._1.length).max

  override def nullSafeEval(s: Any): Any =
    UnigramEncode.encode(s.asInstanceOf[UTF8String], table, maxPieceLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UnigramEncode.encode($c, $ref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  final val Sep = '\u001f'

  /** Static entry shared by interpreted eval and generated code. */
  def encode(
      w: UTF8String,
      costs: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): GenericArrayData = {
    val pieces = segment(w.toString, costs, maxPieceLen)
    val arr = new Array[Any](pieces.length)
    var k = 0
    while (k < pieces.length) { arr(k) = UTF8String.fromString(pieces(k)); k += 1 }
    new GenericArrayData(arr)
  }

  /** The Viterbi DP itself, shared with the driver-side trainer (the
    * training rounds segment the collected word types with exactly this
    * code, so trainer and encoder cannot drift).
    */
  def segment(
      w: String,
      costs: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    // best* indexed by prefix length; path holds Sep-joined pieces.
    val bestCost = new Array[Long](n + 1)
    val bestNp = new Array[Int](n + 1)
    val bestPath = new Array[String](n + 1)
    bestPath(0) = ""
    var i = 1
    while (i <= n) {
      var found = false
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (bestPath(j) != null) {
          val piece = w.substring(j, i)
          val c = costs.get(piece)
          if (c != null) {
            val cost = bestCost(j) + c.longValue()
            val np = bestNp(j) + 1
            val path =
              if (bestPath(j).isEmpty) piece else bestPath(j) + Sep + piece
            val better = !found || cost < bestCost(i) ||
              (cost == bestCost(i) && (np < bestNp(i) ||
                (np == bestNp(i) && path.compareTo(bestPath(i)) < 0)))
            if (better) {
              bestCost(i) = cost; bestNp(i) = np; bestPath(i) = path
              found = true
            }
          }
        }
        j += 1
      }
      if (!found) bestPath(i) = null
      i += 1
    }
    require(bestPath(n) != null,
      s"unigram vocab does not cover '$w' — single characters must never be pruned")
    if (bestPath(n).isEmpty) Array.empty
    else bestPath(n).split(Sep)
  }
}

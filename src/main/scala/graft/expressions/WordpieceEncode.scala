package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd WordPiece encode: greedy longest-match-first ("maximal
  * munch") segmentation of one word against a trained vocabulary, the
  * BERT-family rule — at each position take the LONGEST vocabulary piece
  * that matches, where every non-initial piece carries the `##`
  * continuation prefix; if no piece matches at a reached position the
  * whole word encodes as the single `[UNK]` token. Unlike
  * [[BpeEncode]] (merge-rank replay) and [[UnigramEncode]] (min-cost
  * Viterbi), the greedy rule needs no scores — vocabulary MEMBERSHIP
  * fully determines the unique segmentation, so there are no ties to
  * break.
  *
  * Like its two siblings, the model (the vocabulary set) is part of the
  * EXPRESSION — small, driver-held, shipped once per task via the
  * codegen reference array.
  */
case class WordpieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece_encode"

  private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest RAW (unprefixed) character span any vocabulary piece covers. */
  private lazy val maxRawLen: Int =
    if (vocab.isEmpty) 1
    else vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  override def nullSafeEval(s: Any): Any =
    WordpieceEncode.encode(s.asInstanceOf[UTF8String], table, maxRawLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", table, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordpieceEncode.encode($c, $ref, $maxRawLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceEncode =
    copy(child = newChild)
}

object WordpieceEncode {

  final val Unk = "[UNK]"

  /** Static entry shared by interpreted eval and generated code. */
  def encode(
      w: UTF8String,
      vocab: java.util.HashSet[String],
      maxRawLen: Int): GenericArrayData = {
    val pieces = segment(w.toString, vocab, maxRawLen)
    val arr = new Array[Any](pieces.length)
    var k = 0
    while (k < pieces.length) { arr(k) = UTF8String.fromString(pieces(k)); k += 1 }
    new GenericArrayData(arr)
  }

  /** The greedy matcher itself: unique by construction (no tie-breaks). */
  def segment(
      w: String,
      vocab: java.util.HashSet[String],
      maxRawLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val prefix = if (i == 0) "" else "##"
      var l = math.min(maxRawLen, n - i)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = prefix + w.substring(i, i + l)
        if (vocab.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      i += found.length - prefix.length
    }
    out.toArray
  }
}

package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.expressions._

/** The engine's SQL function surface: every custom Catalyst expression,
  * name → builder, defined ONCE and reachable two ways —
  *
  *  - at session build time via `spark.sql.extensions=graft.GraftExtensions`
  *    ([[GraftExtensions]]);
  *  - on an EXISTING session via [[GraftFunctions.register]] (tests,
  *    notebooks, sessions the caller doesn't construct).
  *
  * The DataFrame API reaches the same expressions directly through the
  * operator/function objects; these registrations are for `spark.sql(...)`
  * users.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** A foldable `array(array('a','b'), ...)` of 2-element string pairs —
    * the SQL spelling of a BPE merge table in rank order.
    */
  private def pairsLit(e: Expression, what: String): Seq[(String, String)] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a foldable array of 2-element string arrays, got $e")
    val outer = e.eval(null).asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { i =>
      val pair = outer.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"$what entries must each hold exactly 2 strings")
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }
  }

  /** A foldable `array(array('piece', '17'), ...)` cost table — the
    * unigram model rides as 2-element string arrays (piece, decimal
    * cost); a map literal would lose the deterministic entry order.
    */
  private def costsLit(e: Expression, what: String): Seq[(String, Long)] =
    pairsLit(e, what).map { case (p, c) => (p, c.toLong) }

  /** A foldable `array('piece', ...)` vocabulary literal. */
  private def vocabLit(e: Expression, what: String): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a foldable array of strings, got $e")
    val arr = e.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def fn(
      name: String,
      arity: Int,
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity,
          s"$name expects exactly $arity arguments, got ${children.length}")
        build(children)
      })

  /** Every registration triple, shared by both installation paths. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dot", 2, c => DotProductLong(c(0), c(1))),
    fn("graft_mg", 2, c => MisraGries(c(0), intLit(c(1), "graft_mg's k"))),
    fn("graft_tokens", 1, c => WhitespaceTokens(c(0))),
    fn("graft_md5_60", 1, c => Md5Long60(c(0))),
    fn("graft_md5_52", 1, c => Md5Long52(c(0))),
    fn("graft_md5_binary", 1, c => Md5Binary(c(0))),
    fn("graft_simhash", 1, c => SimHash64(c(0))),
    fn("graft_shingle_min", 2, c =>
      Md5ShingleMin(c(0), intLit(c(1), "graft_shingle_min's k"))),
    fn("graft_minhash_sigs", 3, c =>
      MinHashSigs(c(0), intLit(c(1), "graft_minhash_sigs's k"),
        intLit(c(2), "graft_minhash_sigs's numHashes"))),
    fn("graft_shingle_digests", 2, c =>
      ShingleDigests(c(0), intLit(c(1), "graft_shingle_digests's k"))),
    fn("graft_rolling_digests", 2, c =>
      RollingDigests(c(0), intLit(c(1), "graft_rolling_digests's w"))),
    fn("graft_gram_stats", 2, c =>
      GramStats(c(0), intLit(c(1), "graft_gram_stats's n"))),
    fn("graft_bpe_encode", 2, c =>
      BpeEncode(c(0), pairsLit(c(1), "graft_bpe_encode's merge table"))),
    fn("graft_unigram_encode", 2, c =>
      UnigramEncode(c(0), costsLit(c(1), "graft_unigram_encode's cost table"))),
    fn("graft_wordpiece_encode", 2, c =>
      WordpieceEncode(c(0), vocabLit(c(1), "graft_wordpiece_encode's vocabulary"))),
    fn("graft_hilbert", 3, c =>
      HilbertIndex(c(0), c(1), intLit(c(2), "graft_hilbert's bits"))),
    (
      FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, "graft_morton"),
      (children: Seq[Expression]) => {
        require(children.length >= 2,
          s"graft_morton expects (bits, dim1, dim2, ...), got ${children.length} arguments")
        MortonIndex(children.drop(1), intLit(children.head, "graft_morton's bits"))
      }),
    fn("graft_byte_remap", 1, c => ByteRemap(c(0))),
    fn("graft_byte_unmap", 1, c => ByteUnmap(c(0))),
    // Strict unmap raises on codepoints outside the remap image — only
    // safe on provable graft_byte_remap output; the lenient twin NULLs
    // instead, so ad-hoc SQL over arbitrary columns can't fail a
    // corpus-scale scan on one stray string (r15 advice).
    fn("graft_byte_unmap_lenient", 1, c => ByteUnmap(c(0), lenient = true)),
    fn("graft_cdc_chunks", 2, c =>
      CdcChunks(c(0), intLit(c(1), "graft_cdc_chunks's modulus"))),
    fn("graft_topk_min", 2, c =>
      TopKMin(c(0), intLit(c(1), "graft_topk_min's k"))))

  /** Install the full surface on an already-running session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.bridge.registerFunction(spark, id, info, builder)
    }
}

/** SparkSessionExtensions entry point: activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

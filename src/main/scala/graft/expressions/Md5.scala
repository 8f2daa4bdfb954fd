package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest-slice expressions: the engine's portable md5 idioms
  * (`conv(substr(md5(x), 1, 15), 16, 10)` etc.) computed directly from the
  * 16 digest bytes, skipping the 32-char hex string round trip (format +
  * substring + radix parse) the built-in formulation pays per value. The
  * numeric results are bit-identical to the SQL idioms — hex chars 1-15
  * are the top 60 bits of the digest's first 8 bytes, chars 17-29 the top
  * 52 bits of bytes 8-15 — which a differential spec pins.
  *
  * [[Md5Pair]] emits BOTH sub-hashes from ONE digest computation (the
  * MinHash signature path needs h1 and h2 per shingle; two independent
  * expressions would hash twice). [[Md5Binary]] returns the raw digest for
  * order-based uses: unsigned byte order on binary equals lexicographic
  * order on the hex string, so `min` can run on 16-byte values and the hex
  * formatting happens once per GROUP, not once per row.
  */
private[graft] trait Md5Input { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
}

/** Top 60 bits of md5 (hex chars 1-15) as a non-negative long. */
case class Md5Long60(child: Expression) extends UnaryExpression with Md5Input {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_60"
  override def nullSafeEval(s: Any): Any = Md5.long60(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.long60($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

/** Bits from hex chars 17-29 (52 bits of digest bytes 8-15) as a long. */
case class Md5Long52(child: Expression) extends UnaryExpression with Md5Input {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_52"
  override def nullSafeEval(s: Any): Any = Md5.long52(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.long52($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Long52 =
    copy(child = newChild)
}

/** Both sub-hashes from one digest: struct<h60: long, h52: long>. */
case class Md5Pair(child: Expression) extends UnaryExpression with Md5Input {
  override def dataType: DataType = StructType(Seq(
    StructField("h60", LongType, nullable = false),
    StructField("h52", LongType, nullable = false)))
  override def prettyName: String = "graft_md5_pair"
  override def nullSafeEval(s: Any): Any = Md5.pair(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.pair($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Pair =
    copy(child = newChild)
}

/** The raw 16 digest bytes (unsigned byte order ≡ hex string order). */
case class Md5Binary(child: Expression) extends UnaryExpression with Md5Input {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_md5_bin"
  override def nullSafeEval(s: Any): Any = Md5.bytes(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.bytes($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Binary =
    copy(child = newChild)
}

/** Per-document fused shingle hashing: these two expressions walk the
  * words array once, digesting each k-shingle ("w1 w2 … wk") in place —
  * no shingle-string array, no distinct, no explode, no shuffle. A min is
  * invariant under duplicates, so skipping array_distinct is exact.
  */

/** Min md5 digest over a doc's k-shingles (16 bytes; unsigned byte order
  * ≡ hex order). Null when the doc has fewer than k words.
  */
case class Md5ShingleMin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_md5_shingle_min"
  override def nullSafeEval(a: Any): Any =
    Md5.shingleMin(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.Md5.shingleMin($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): Md5ShingleMin =
    copy(child = newChild)
}

/** All `numHashes` MinHash signature minima of a doc's k-shingles in one
  * pass — the rotate_j(h1) XOR h2 family of [[graft.operators.Dedup]],
  * emitted as array<long>. Empty array when the doc has no shingles.
  */
case class MinHashSigs(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
  require(k >= 1 && numHashes >= 1 && numHashes <= 16)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"
  override def nullSafeEval(a: Any): Any =
    Md5.minhashSigs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.minhashSigs($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Both MinHash signature minima AND the distinct 60-bit shingle digests
  * from ONE digest pass over a doc's k-shingles:
  * struct<sigs: array<long>, shl: array<long>>. This is the shape LSH
  * verification wants — [[MinHashSigs]] + [[ShingleDigests]] as separate
  * columns would md5 every shingle twice. Empty arrays when the doc has
  * fewer than k words.
  */
case class MinHashSigDigests(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
  require(k >= 1 && numHashes >= 1 && numHashes <= 16)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("sigs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("shl", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_minhash_sig_digests"
  override def nullSafeEval(a: Any): Any =
    Md5.minhashSigDigests(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.minhashSigDigests($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigDigests =
    copy(child = newChild)
}

/** DISTINCT 60-bit md5 digests of a doc's k-shingles as array<long> —
  * the fused form of shingle-string construction + array_distinct +
  * explode + Md5Long60, for consumers that join on shingle digests
  * (jaccard verification). Empty array when the doc has no shingles.
  */
case class ShingleDigests(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_digests"
  override def nullSafeEval(a: Any): Any =
    Md5.shingleDigests(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.shingleDigests($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleDigests =
    copy(child = newChild)
}

/** EVERY dense w-token window digest in start order (array index =
  * window start) as array<long> — the fused form of the
  * `transform(sequence)/slice/array_join/md5` chain that feeds the
  * rolling-window family (rollingPassageDedup, substringDecontaminate,
  * selfRepeatedSubstrings). Deliberately NON-distinct, unlike
  * [[ShingleDigests]]: the consumers key on (start, digest) positions.
  * Digests are the same 60-bit md5 slice over the space-joined window as
  * `graft_md5_60(array_join(...))`, so existing oracles replay
  * unchanged. Empty array for docs shorter than the window.
  */
case class RollingDigests(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_digests"
  override def nullSafeEval(a: Any): Any =
    Md5.rollingDigests(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.rollingDigests($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): RollingDigests =
    copy(child = newChild)
}

/** Fused content-defined chunking (token-level FastCDC): ONE pass over a
  * doc's words array computing boundary tests (md5 per word, ≡ 0 mod
  * `modulus`, last word never a boundary) AND the per-chunk digest (md5
  * of the space-joined chunk words, top 60 bits), returning
  * `array<struct<start_pos, n_words, dig>>` in document order — digest-
  * and span-identical to the declarative
  * `filter(sequence(1,n), i -> pmod(graft_md5_60(ws[i]), m) = 0 AND i < n)`
  * + `zip_with` spans + per-chunk `graft_md5_60(array_join(slice(...)))`
  * chain, which is what the DuckDB oracles replay. Why an expression:
  * that chain is four nested `HigherOrderFunction`s — all interpreted,
  * with the per-WORD md5 lambda duplicated into each consumer by
  * CollapseProject — measured at ~3.9 s for a 5,000-doc scan where this
  * fused pass is sub-second; at corpus scale the boundary scan IS the
  * CDC family's cost.
  */
case class CdcChunks(child: Expression, modulus: Int) extends UnaryExpression {
  require(modulus >= 2, s"modulus=$modulus must be >= 2")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start_pos", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("dig", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override def nullSafeEval(a: Any): Any =
    Md5.cdcChunks(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], modulus)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.cdcChunks($c, $modulus)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** 64-bit tf-weighted SimHash of a words array as a 16-char lowercase hex
  * string, in one pass: per-doc term frequencies, per-bit weighted
  * majorities over each word's leading 64 md5 bits, nibble reassembly —
  * the fused form of the two-shuffle wordcount + bit-majority
  * formulation (bit-identical output).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"
  override def nullSafeEval(a: Any): Any =
    Md5.simhash64(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object Md5 {

  private val tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // Word bytes are extracted (and possibly copied) ONCE per document —
  // each word participates in up to k shingles, and re-extracting per
  // shingle was measured per-row CPU waste on the dedup hot path.
  private def wordBytes(
      words: org.apache.spark.sql.catalyst.util.ArrayData): Array[Array[Byte]] = {
    val n = words.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { out(i) = words.getUTF8String(i).getBytes; i += 1 }
    out
  }

  private def shingleDigest(
      md: MessageDigest,
      wb: Array[Array[Byte]],
      start: Int,
      k: Int): Array[Byte] = {
    md.reset()
    var j = 0
    while (j < k) {
      if (j > 0) md.update(' '.toByte)
      md.update(wb(start + j))
      j += 1
    }
    md.digest()
  }

  def shingleDigests(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = words.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    val md = tl.get()
    val wb = wordBytes(words)
    val seen = new java.util.LinkedHashSet[java.lang.Long](64)
    var i = 0
    while (i <= n - k) {
      seen.add(be64(shingleDigest(md, wb, i, k), 0) >>> 4)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def rollingDigests(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = words.numElements()
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    val md = tl.get()
    val wb = wordBytes(words)
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      out(i) = be64(shingleDigest(md, wb, i, w), 0) >>> 4
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def shingleMin(words: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): Array[Byte] = {
    val n = words.numElements()
    if (n < k) return null
    val md = tl.get()
    val wb = wordBytes(words)
    var best: Array[Byte] = null
    var i = 0
    while (i <= n - k) {
      val d = shingleDigest(md, wb, i, k)
      if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0) best = d
      i += 1
    }
    best
  }

  def minhashSigs(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int,
      numHashes: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = words.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    val md = tl.get()
    val wb = wordBytes(words)
    // Rotation constants are j-only — hoisted out of the shingle loop.
    val los = new Array[Long](numHashes)
    val his = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val s = (1 + 7 * j) % 60
      los(j) = 1L << (60 - s)
      his(j) = 1L << s
      j += 1
    }
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= n - k) {
      val d = shingleDigest(md, wb, i, k)
      val h1 = be64(d, 0) >>> 4
      val h2 = be64(d, 8) >>> 12
      j = 0
      while (j < numHashes) {
        val sig = ((h1 % los(j)) * his(j) + h1 / los(j)) ^ h2
        if (sig < sigs(j)) sigs(j) = sig
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  def minhashSigDigests(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int,
      numHashes: Int): InternalRow = {
    val n = words.numElements()
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    if (n < k) return new GenericInternalRow(Array[Any](empty, empty))
    val md = tl.get()
    val wb = wordBytes(words)
    val los = new Array[Long](numHashes)
    val his = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val s = (1 + 7 * j) % 60
      los(j) = 1L << (60 - s)
      his(j) = 1L << s
      j += 1
    }
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.LinkedHashSet[java.lang.Long](64)
    var i = 0
    while (i <= n - k) {
      val d = shingleDigest(md, wb, i, k)
      val h1 = be64(d, 0) >>> 4
      val h2 = be64(d, 8) >>> 12
      seen.add(h1)
      j = 0
      while (j < numHashes) {
        val sig = ((h1 % los(j)) * his(j) + h1 / los(j)) ^ h2
        if (sig < sigs(j)) sigs(j) = sig
        j += 1
      }
      i += 1
    }
    val shl = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { shl(m) = it.next(); m += 1 }
    new GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(shl)))
  }

  def bytes(s: UTF8String): Array[Byte] = {
    val md = tl.get()
    md.reset()
    md.digest(s.getBytes)
  }

  def cdcChunks(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      modulus: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = words.numElements()
    val md = tl.get()
    // NULL array elements keep the retired declarative chain's
    // semantics: a null word is never a boundary (the filter lambda's
    // `pmod(md5(null), m) = 0` is NULL → dropped) and vanishes from the
    // chunk digest text (array_join skips nulls) while still occupying
    // its position in the span arithmetic.
    val wb = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      wb(j) = if (words.isNullAt(j)) null else words.getUTF8String(j).getBytes
      j += 1
    }
    val mod = modulus.toLong
    // 1-based boundary position i (never the last word): span ends at i.
    val spans = new scala.collection.mutable.ArrayBuffer[(Int, Int)](8)
    var s = 1
    var i = 1
    while (i < n) {
      if (wb(i - 1) != null) {
        md.reset()
        md.update(wb(i - 1))
        val h = be64(md.digest(), 0) >>> 4
        if (h % mod == 0L) { spans += ((s, i)); s = i + 1 }
      }
      i += 1
    }
    spans += ((s, n)) // n = 0 keeps the declarative chain's (1, 0) span
    val out = new Array[Any](spans.size)
    var c = 0
    while (c < spans.size) {
      val (st, en) = spans(c)
      md.reset()
      var k = st - 1
      var first = true
      while (k < en) {
        if (wb(k) != null) {
          if (!first) md.update(' '.toByte)
          md.update(wb(k))
          first = false
        }
        k += 1
      }
      val dig = be64(md.digest(), 0) >>> 4
      out(c) = new GenericInternalRow(
        Array[Any](st.toLong, (en - st + 1).toLong, dig))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Hex chars 1-15 = the top 60 bits of bytes 0-7. */
  def long60(s: UTF8String): Long = be64(bytes(s), 0) >>> 4

  /** Hex chars 17-29 = the top 52 bits of bytes 8-15. */
  def long52(s: UTF8String): Long = be64(bytes(s), 8) >>> 12

  def pair(s: UTF8String): InternalRow = {
    val d = bytes(s)
    new GenericInternalRow(Array[Any](be64(d, 0) >>> 4, be64(d, 8) >>> 12))
  }

  def simhash64(words: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = words.numElements()
    // Per-doc term frequencies (UTF8String keys hash/compare by bytes).
    val counts = new java.util.HashMap[UTF8String, Long](64)
    var i = 0
    while (i < n) {
      counts.merge(words.getUTF8String(i), 1L, (a, b) => a + b)
      i += 1
    }
    val md = tl.get()
    val bitSums = new Array[Long](64)
    var total = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue
      md.reset()
      val h64 = be64(md.digest(e.getKey.getBytes), 0)
      var np = 0
      while (np < 16) {
        val v = ((h64 >>> (60 - 4 * np)) & 15L).toInt
        var b = 0
        while (b < 4) {
          if (((v >> b) & 1) == 1) bitSums(np * 4 + b) += cnt
          b += 1
        }
        np += 1
      }
      total += cnt
    }
    val hexDigits = "0123456789abcdef"
    val out = new Array[Byte](16)
    var np = 0
    while (np < 16) {
      var nib = 0
      var b = 0
      while (b < 4) {
        if (bitSums(np * 4 + b) * 2 >= total) nib |= (1 << b)
        b += 1
      }
      out(np) = hexDigits.charAt(nib).toByte
      np += 1
    }
    UTF8String.fromBytes(out)
  }
}

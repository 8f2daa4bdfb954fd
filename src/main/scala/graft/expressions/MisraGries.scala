package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a MERGEABLE typed imperative
  * aggregate — the bounded-state path to heavy hitters when the exact
  * `groupBy(item).count` shuffle key space (the vocabulary) is itself the
  * scale problem. State is AT MOST `k` (item, count) counters per
  * aggregation buffer, map-side partials carry ≤ k entries into the
  * shuffle regardless of how many distinct items a partition saw, and
  * partials combine with the Agarwal et al. (PODS'12, "Mergeable
  * Summaries") merge: sum counts, then if more than `k` survive, subtract
  * the (k+1)-th largest count from all and drop the non-positive.
  *
  * Guarantees after ANY merge tree over a stream of n items:
  *   - undercount only: `est(i) ≤ true(i)`
  *   - bounded error:   `true(i) − est(i) ≤ n / (k+1)`
  *   - total recall above threshold: every item with
  *     `true(i) > n/(k+1)` is present in the summary.
  *
  * The surviving set and estimates of items NEAR the threshold depend on
  * partitioning (like every MG implementation); only the facts above are
  * stable, which is exactly what [[graft.functions.Sketches]]'s checked
  * surface exposes. Output: `map<string, long>` of surviving items to
  * their (under-)estimates.
  *
  * The reference has no sketch surface at all (SURVEY §2.8); this is part
  * of the 100 TB extension set alongside KMV/HLL/Bloom.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"MisraGries needs k >= 1 counters, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${dt.catalogString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < k =>
          // Unsafe rows reuse their backing buffer — keys must own bytes.
          buf.update(item.clone(), 1L)
        case None =>
          // Classic MG overflow: decrement every counter, drop zeros (the
          // arriving item is charged against all k incumbents).
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1L
            if (c == 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest count from everything; ≤ k survive.
      val cut = buf.valuesIterator.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0L) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // Key-sorted output so the map's physical layout is canonical.
    val entries = buf.toArray.sortWith((a, b) => a._1.compareTo(b._1) < 0)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

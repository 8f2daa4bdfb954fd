package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The `k` SMALLEST long values of a group, as a MERGEABLE typed
  * imperative aggregate returning the ascending-sorted array — the
  * bounded-state alternative to `row_number() OVER (PARTITION BY g
  * ORDER BY v) <= k`: the window formulation shuffles EVERY input row to
  * its group's partition before ranking, while this aggregate's map-side
  * partials carry at most `k` values per group into the shuffle no matter
  * how many rows a partition saw.
  *
  * Where it matters: kNN-style scores, where the input is an n²
  * pair-distance stream but the answer per vector is its k nearest —
  * with the candidate side broadcast, every pair for a vector is
  * generated in ONE task, so the partial aggregate is already the exact
  * top-k and the exchange moves n·k values instead of n². That is the
  * difference between a shuffle that scales with the corpus and one that
  * scales with its square.
  *
  * State: a size-≤k binary max-heap (`mutable.PriorityQueue`); update is
  * O(log k) with an O(1) reject of values above the current k-th; merge
  * pushes the smaller summary into the larger. Exactness: the k smallest
  * MULTISET of a union is computable from the k smallest of each part —
  * no approximation anywhere, so max/sum/element-at over the result are
  * engine-bit-identical to the window formulation (boundary TIES may
  * select different witnesses, but the selected VALUES are identical,
  * which is all the array exposes). Nulls are ignored like the built-in
  * aggregates; a group of all-null inputs yields an empty array.
  */
case class TopKMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"TopKMin needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_min"

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // max-heap: head = largest kept value

  override def update(
      buf: mutable.PriorityQueue[Long],
      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.size < k) buf.enqueue(x)
      else if (x < buf.head) { buf.dequeue(); buf.enqueue(x) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    val (into, from) = if (buf.size >= other.size) (buf, other) else (other, buf)
    from.foreach { x =>
      if (into.size < k) into.enqueue(x)
      else if (x < into.head) { into.dequeue(); into.enqueue(x) }
    }
    into
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buf.toArray.sorted.map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.PriorityQueue.empty[Long]
    var i = 0
    while (i < n) { buf.enqueue(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMin =
    copy(child = newChild)
}

package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.Action

/** Bounded top-K-by-recency typed aggregation (SURVEY §7.2a): keeps at most
  * `k` actions per group in a bounded heap during partial aggregation, so a
  * customer with a million-action history ships only `k` rows through the
  * shuffle — the typed-Dataset alternative to the window + `rn <= k`
  * formulation (whose SQL path Spark 3.5+ already bounds with
  * `WindowGroupLimit`, but only after materializing each partition's rows).
  *
  * Ordering matches the pipeline's total order: `action_time DESC,
  * item_id, action_type`.
  */
class TopKRecentActions(k: Int)
    extends Aggregator[Action, mutable.PriorityQueue[Action], Seq[Action]] {

  // compare(x, y) < 0 ⟺ x ranks before y in the output (more recent first).
  private def rankCompare(x: Action, y: Action): Int = {
    val t = -x.action_time.compareTo(y.action_time)
    if (t != 0) t
    else {
      val i = java.lang.Long.compare(x.item_id, y.item_id)
      if (i != 0) i else Integer.compare(x.action_type, y.action_type)
    }
  }

  // Max-heap under rank order: the head is the WORST (least recent) kept
  // element, dequeued first when the bound is exceeded.
  private val heapOrd: Ordering[Action] = (x: Action, y: Action) => rankCompare(x, y)

  override def zero: mutable.PriorityQueue[Action] = mutable.PriorityQueue.empty(heapOrd)

  override def reduce(q: mutable.PriorityQueue[Action], a: Action): mutable.PriorityQueue[Action] = {
    q.enqueue(a)
    if (q.size > k) q.dequeue()
    q
  }

  override def merge(
      a: mutable.PriorityQueue[Action],
      b: mutable.PriorityQueue[Action]): mutable.PriorityQueue[Action] = {
    b.foreach { x => a.enqueue(x); if (a.size > k) a.dequeue() }
    a
  }

  override def finish(q: mutable.PriorityQueue[Action]): Seq[Action] =
    q.toSeq.sortWith(rankCompare(_, _) < 0)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Action]] =
    Encoders.kryo[mutable.PriorityQueue[Action]]

  override def outputEncoder: Encoder[Seq[Action]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Action]]()
}

object TopKRecentActions {

  /** Per-customer bounded history via the typed aggregator: one shuffle
    * carrying ≤ k actions per customer, fixed-length padded output arrays
    * identical in shape to `customerHistoryBeforeDt`'s.
    */
  def customerHistoryTopK(
      spark: SparkSession,
      actions: Dataset[Action],
      k: Int): Dataset[(Long, Seq[Long], Seq[Int])] = {
    import spark.implicits._
    actions
      .groupByKey(_.customer_id)
      .agg(new TopKRecentActions(k).toColumn.name("hist"))
      .map { case (cust, hist) =>
        val items = hist.map(_.item_id) ++ Seq.fill(k)(0L)
        val types = hist.map(_.action_type) ++ Seq.fill(k)(0)
        (cust, items.take(k), types.take(k))
      }
  }
}

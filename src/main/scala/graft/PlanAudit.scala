package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, RoundRobinPartitioning}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan guardrails as a library API: the checks that catch
  * would-be 100 TB incidents (accidental cross products, runaway shuffle
  * counts, lost scan pushdown) while the job is still a code review.
  * `PlanShapeSpec` pins this engine's own operators with it; user
  * pipelines can assert their own plans the same way:
  *
  * {{{
  * val a = PlanAudit(df)
  * require(!a.hasCrossProduct, a.render)
  * require(a.dataShuffles <= 4, a.render)
  * }}}
  */
final case class PlanAudit(
    dataShuffles: Int,
    hasCrossProduct: Boolean,
    broadcasts: Int,
    scansWithoutPushdown: Int,
    planString: String) {
  def render: String =
    s"shuffles=$dataShuffles crossProduct=$hasCrossProduct broadcasts=$broadcasts " +
      s"scansWithoutPushdown=$scansWithoutPushdown\n$planString"
}

object PlanAudit {

  def apply(df: DataFrame): PlanAudit = {
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    PlanAudit(
      dataShuffles = dataShuffles(plan),
      hasCrossProduct =
        s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin"),
      broadcasts = "BroadcastExchange".r.findAllIn(s).length,
      scansWithoutPushdown = "PushedFilters: \\[\\]".r.findAllIn(s).length,
      planString = s)
  }

  /** Count the DATA shuffles this plan will EXECUTE (hash/range/
    * round-robin exchanges — every full-data redistribution, including
    * plain `repartition(n)`; one-row SinglePartition collects don't move
    * data at scale): walk the physical tree, descending into each
    * distinct cached (persisted) subtree exactly once — a cached plan
    * materializes once no matter how many times the query references it,
    * so its exchanges must not be multiply counted, nor may
    * re-references hide work (the first reference charges the full
    * build).
    */
  def dataShuffles(plan: SparkPlan): Int = {
    val seenCaches = mutable.Set[Int]()
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: InMemoryTableScanExec =>
        if (seenCaches.add(System.identityHashCode(s.relation.cacheBuilder)))
          walk(s.relation.cachedPlan)
        else 0
      case sh: ShuffleExchangeLike =>
        val moves = sh.outputPartitioning.isInstanceOf[HashPartitioning] ||
          sh.outputPartitioning.isInstanceOf[RangePartitioning] ||
          sh.outputPartitioning.isInstanceOf[RoundRobinPartitioning]
        (if (moves) 1 else 0) + sh.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(plan)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks natively, in their scale-correct
  * formulations.
  *
  * The naive as-of join (`l JOIN r ON key AND r.t <= l.t` + argmax) and the
  * naive range join (`p JOIN i ON key AND p.t BETWEEN i.s AND i.e`) both
  * plan as inequality joins — per-key cross products that explode on hot
  * keys. Both operators here are single-equi-shuffle plans instead: the
  * as-of join is a union + one window pass, the range join replicates each
  * interval to the fixed-width time buckets it covers and equi-joins on
  * (key, bucket). Those are the shapes that survive a 100 TB event table.
  */
object Joins {

  /** As-of join: for every left row, the single most recent right row with
    * the same key and `rightTime <= leftTime` (ties on time broken by the
    * largest right payload, lexicographically — a total, engine-portable
    * order).
    *
    * Plan: tag and union both sides, then one window
    * (partitionBy keys, orderBy (time, side)) computes a running
    * `max(struct(rightTime, rightCols*))` over right rows only — `max`
    * ignores the nulls the left rows carry in that slot, and the
    * right-before-left side order makes an exactly-simultaneous right row
    * visible to its left peer. One shuffle on the key, no inequality-join
    * row explosion; skew equals key skew, same as any keyed window.
    *
    * `maxLookback` (same unit as the time columns) optionally voids
    * matches older than `leftTime - maxLookback` — the bounded-staleness
    * knob real pipelines need (a "most recent view" from three years ago
    * is noise).
    *
    * Output: every left column, plus the match's time and each of
    * `rightCols` as `matched_<name>` (null when no right row qualifies —
    * left rows always survive).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      maxLookback: Option[Long] = None): DataFrame = {
    val reserved = Seq("_t", "_side", "_l", "_r", "_m")
    require(
      !(left.columns ++ right.columns).exists(reserved.contains),
      s"asOfJoin reserves column names ${reserved.mkString(", ")}")
    val leftPayloadCols = left.columns.filterNot(keys.contains).toSeq
    val rFields = Seq(rightTime) ++ rightCols
    val lType = StructType(leftPayloadCols.map(left.schema(_)))
    val rType = StructType(rFields.map(right.schema(_)))
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        lit(1).as("_side"),
        struct(leftPayloadCols.map(col): _*).as("_l"),
        lit(null).cast(rType).as("_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        lit(null).cast(lType).as("_l"),
        struct(rFields.map(col): _*).as("_r")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = max(col("_r")).over(w)
    val matched = maxLookback match {
      case Some(lb) =>
        when(matched0.getField(rightTime) >= col("_t") - lit(lb), matched0)
      case None => matched0
    }
    l.unionByName(r)
      .withColumn("_m", matched)
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++
          leftPayloadCols.map(c => col(s"_l.$c").as(c)) ++
          rFields.map(c => col(s"_m.$c").as(s"matched_$c")): _*)
  }

  /** Range (interval-containment) join: every (point, interval) pair with
    * the same key and `pointTime` in `[startCol, endCol]` (inclusive,
    * integral time units), without the inequality-join cross product.
    *
    * Plan: each interval replicates to the `bucketWidth`-sized time
    * buckets it covers; points carry their single bucket; the join is a
    * plain equi-join on (keys, bucket) plus the exact containment filter.
    * A matching pair meets in exactly one bucket (the point's), so no
    * dedup shuffle is needed. Replication factor is
    * `len(interval)/bucketWidth + 1` — pick `bucketWidth` near the
    * typical interval length (a handful of copies), which keeps cost
    * linear while the join shuffles narrowly on (key, bucket); long-tail
    * intervals cost proportionally more copies, never a cross product.
    *
    * Column names (other than `keys`) must be disjoint between the two
    * inputs; output is every point column + every interval column.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTime: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(
      !(points.columns ++ intervals.columns).contains("_b"),
      "rangeJoin reserves the column name _b")
    val p = points.withColumn("_b", expr(s"`$pointTime` DIV ${bucketWidth}L"))
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn(
        "_b",
        explode(sequence(
          expr(s"`$startCol` DIV ${bucketWidth}L"),
          expr(s"`$endCol` DIV ${bucketWidth}L"))))
    p.join(i, keys :+ "_b")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .drop("_b")
  }

  /** Interval-overlap join: every (left, right) interval pair with the
    * same key and `[leftStart, leftEnd] ∩ [rightStart, rightEnd] ≠ ∅`
    * (inclusive ends, integral time units) — the temporal join
    * [[rangeJoin]] doesn't cover (its probe side is points). The
    * warehouse use is version × activity attribution: which SCD2
    * attribute versions ([[graft.operators.Timeseries.scd2Intervals]])
    * were in effect during each session, which experiment windows touch
    * which incident windows.
    *
    * Plan: both sides replicate to the `bucketWidth`-sized time buckets
    * they cover and equi-join on (keys, bucket) + the exact overlap
    * predicate — never an inequality join's per-key cross product. An
    * overlapping pair would meet in EVERY bucket both cover, so the join
    * keeps only the bucket containing `greatest(leftStart, rightStart)`
    * (the overlap's first instant — both intervals cover it by
    * definition): exactly one surviving copy per pair, no dedup shuffle.
    * Replication factor is `len/bucketWidth + 1` per row — pick
    * `bucketWidth` near the typical interval length; long-tail intervals
    * cost proportionally more copies, never a blow-up. That factor (and
    * the bucket arithmetic's alignment) assumes NONNEGATIVE time
    * coordinates: `DIV` truncates toward zero, so bucket 0 would span
    * `(-bucketWidth, bucketWidth)` — twice the width — for data
    * straddling the epoch. Results stay correct for negative inputs
    * (truncation is monotone, so the covered-bucket ranges and the
    * `greatest(starts)` survival bucket still agree); only the stated
    * replication bound degrades around zero. Epoch-microsecond inputs
    * (every caller here) are in-domain.
    *
    * Column names (other than `keys`) must be disjoint between the two
    * inputs; output is every left column + every right column.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(
      !(left.columns ++ right.columns).contains("_b"),
      "intervalJoin reserves the column name _b")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) >= col(s))
      .withColumn(
        "_b",
        explode(sequence(
          expr(s"`$s` DIV ${bucketWidth}L"),
          expr(s"`$e` DIV ${bucketWidth}L"))))
    buckets(left, leftStart, leftEnd)
      .join(buckets(right, rightStart, rightEnd), keys :+ "_b")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(
        expr(s"greatest(`$leftStart`, `$rightStart`) DIV ${bucketWidth}L") === col("_b"))
      .drop("_b")
  }
}

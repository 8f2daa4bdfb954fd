package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completeness operators over an event stream
  * `events(event_id, ts, user_id, event_type, value, props)`.
  *
  * Both operators aggregate FIRST and only then build/join the dense
  * calendar: the raw event table is scanned exactly once, everything after
  * the first aggregation is dimension-sized (|event types| × |days|,
  * |users| × |active days|), so the shapes hold unchanged when the event
  * table is 100 TB — the calendar dimension never grows past metadata
  * size and joins against it broadcast.
  */
object Timeseries {

  /** Daily ingest-volume anomaly flags: each (event_type, day) count is
    * z-scored against that type's OWN daily-count distribution and
    * flagged beyond `threshold`σ — the monitor a data pipeline runs per
    * ingest to catch a collapsed or runaway source before it trains.
    *
    * Deterministic across engines: the mean and variance come from
    * exact-integer sufficient statistics ([[graft.functions.Stats
    * .exactMoments]] — single IEEE divisions, correctly-rounded sqrt),
    * and the z-score is one subtraction and one division on those. A
    * type whose days all match its mean has stddev 0: dividing by it
    * would THROW under Spark's ANSI mode while DuckDB quietly returns
    * NULL — so the division is guarded, z is NULL for a zero-variance
    * type in both engines, and the anomaly flag is explicitly gated on
    * `stddev > 0` (a perfectly steady source is by definition
    * anomaly-free, never flagged).
    *
    * Scale: one (type, day) count aggregate off a single event scan;
    * the per-type moment table is dimension-sized and broadcasts back.
    */
  def dailyAnomalies(events: DataFrame, threshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(
        col("event_type"),
        unix_date(to_date(col("ts"))).cast("long").as("epoch_day"))
      .agg(count(lit(1)).as("n_events"))
    val moments = graft.functions.Stats
      .exactMoments(daily, col("event_type"), col("n_events"))
      .select(col("grp").as("event_type"), col("mean"), col("stddev"))
    daily
      .join(broadcast(moments), Seq("event_type"))
      .withColumn(
        "z",
        when(col("stddev") > 0,
          (col("n_events").cast("double") - col("mean")) / col("stddev")))
      .select(
        col("event_type"), col("epoch_day"), col("n_events"), col("mean"),
        col("z"),
        (col("stddev") > 0 && abs(col("z")) > threshold).as("is_anomaly"))
  }

  /** Zero-filled daily event counts: every (event_type, day) cell of the
    * observed [min-day, max-day] span, with absent cells as explicit
    * zeros — downstream training-data freshness checks and moving-window
    * stats (cf. q49) need gap-free series, and a groupBy alone silently
    * drops empty days.
    *
    * Single-pass, zero-persist plan: the event table is scanned exactly
    * once into the daily aggregate, and the densification happens INSIDE
    * that one lineage with window functions — the global [lo, hi] span
    * as an unpartitioned window min/max (a one-partition exchange, safe
    * because the post-aggregation input is dimension-sized: |types| ×
    * |active days|), then each row emits the zero-run between its
    * predecessor (or `lo`) and itself, plus the trailing run to `hi` on
    * the per-type last row. No cache handle to leak, nothing scanned
    * twice. The `sequence` bounds are guarded: Spark's `sequence(a, b)`
    * DESCENDS when a > b, so empty gaps must produce empty arrays, not
    * backwards runs.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(
        col("event_type"),
        unix_date(to_date(col("ts"))).cast("long").as("epoch_day"))
      .agg(count(lit(1)).as("n"))
    val global = Window.partitionBy()
    val byType = Window.partitionBy(col("event_type")).orderBy(col("epoch_day"))
    def zeroRun(from: Column, to: Column): Column =
      when(from <= to,
        transform(sequence(from, to), d => struct(d.as("epoch_day"), lit(0L).as("n"))))
        .otherwise(array().cast("array<struct<epoch_day:bigint,n:bigint>>"))
    daily
      .withColumn("lo", min(col("epoch_day")).over(global))
      .withColumn("hi", max(col("epoch_day")).over(global))
      .withColumn("fill_from", coalesce(lag(col("epoch_day"), 1).over(byType) + 1, col("lo")))
      .withColumn("tail_to",
        when(lead(col("epoch_day"), 1).over(byType).isNull, col("hi"))
          .otherwise(col("epoch_day")))
      .select(
        col("event_type"),
        explode(concat(
          zeroRun(col("fill_from"), col("epoch_day") - 1),
          array(struct(col("epoch_day"), col("n"))),
          zeroRun(col("epoch_day") + 1, col("tail_to")))).as("cell"))
      .select(
        col("event_type"),
        col("cell.epoch_day").as("epoch_day"),
        col("cell.n").as("n"))
  }

  /** Event-type transition matrix: for each user's event stream in
    * (ts, event_id) order, count every consecutive `from_type → to_type`
    * step — the funnel/Markov-chain summary behind drop-off analysis.
    *
    * Two exchanges, one of them metadata-sized: the `lead` window
    * shuffles by user once, and the final count's exchange carries only
    * map-side partials bounded by |types|² per task. The tie-break on
    * `event_id` makes the sequence — and therefore every count — a
    * deterministic function of the data, not of partition order.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention: users grouped by their first-seen day (the cohort),
    * counted by how many distinct days later they were active again —
    * `(cohort_day, day_offset) → n_active`, the classic retention
    * triangle.
    *
    * One pass: distinct (user, day) pairs (the only event-table-sized
    * shuffle), the cohort day as a window `min` over the user partition
    * (no second join), then a dimension-sized final aggregate. Because
    * the input to the final groupBy is (user, day)-distinct, `count(*)`
    * IS the distinct-user count — no `count_distinct` state needed.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ud = events
      .select(
        col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("d"))
      .distinct()
    ud.withColumn("cohort_day", min(col("d")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}

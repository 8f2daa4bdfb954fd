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
    // Bounded-input invariant (r21 window audit): `global` runs over the
    // per-(event_type, day) AGGREGATE — rows ≤ #event types × day span,
    // a calendar-bounded frame, never the raw events.
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

  /** Exponentially-weighted moving average of the daily event-count
    * series, per type — the smoother behind "is today's ingest volume
    * drifting from trend" dashboards, where a plain moving average
    * ([[q49|moving window]]-style) over-weights stale days. Weight for a
    * day `g` days back is `0.5^g` over a finite `windowDays`-day lookback
    * (a half-life of one day), and the average runs over the
    * [[gapFill]]ed series so absent days pull the trend DOWN as true zeros
    * instead of silently vanishing from the weight mass.
    *
    * Deterministic across engines by construction: every weight is an
    * exact power of two (`0.5^g`, `g ≤ windowDays`), every weighted term
    * `n·0.5^g` is an exact multiple of `2^-windowDays` far below the
    * 53-bit mantissa limit, so BOTH the weighted sum and the weight sum
    * are exact in IEEE doubles in ANY summation order — no
    * float-associativity hazard — and the single final division is
    * correctly rounded identically everywhere.
    *
    * Scale: ONE pass — the event table is scanned once into the daily
    * aggregate (inside [[gapFill]]), and the lookback runs as a RANGE
    * window over the dense series (collect the ≤ `windowDays`+1 lookback
    * cells per row, fold the weighted sums with a higher-order
    * `aggregate`), so there is no self-join and no second scan of the
    * subtree; the window's per-type clustering is satisfied by the hash
    * partitioning [[gapFill]]'s own windows already established, adding
    * zero exchanges on top (pinned in PlanShapeSpec).
    */
  def ewmaSmooth(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 0, s"windowDays=$windowDays must be >= 0")
    val lookback = Window.partitionBy(col("event_type")).orderBy(col("epoch_day"))
      .rangeBetween(-windowDays.toLong, 0L)
    def weighted(term: Column => Column): Column =
      aggregate(
        col("_hist"), lit(0.0),
        (acc, cell) => acc +
          term(cell.getField("hn")) *
          pow(lit(0.5), (col("epoch_day") - cell.getField("d")).cast("double")))
    gapFill(events)
      .withColumn(
        "_hist",
        collect_list(struct(col("epoch_day").as("d"), col("n").as("hn"))).over(lookback))
      .select(
        col("event_type"), col("epoch_day"), col("n").as("n_events"),
        (weighted(hn => hn.cast("double")) / weighted(_ => lit(1.0))).as("ewma"))
  }

  /** Ordered conversion funnel: for a sequence of step event types, the
    * per-user timestamps of the FIRST time each step happened strictly
    * after the previous step — "signed up, then later viewed, then later
    * clicked, then later purchased" — summarized as per-stage user counts
    * and mean time-from-first-step. An unordered `count(distinct user)
    * filter(type = s)` overcounts: a purchase BEFORE the first view is
    * not a conversion through the funnel, and only the progressive
    * strictly-after constraint expresses that.
    *
    * Single-pass: the scan is filtered to the step types (`event_type
    * IN` pushes to parquet), shuffled ONCE on `user_id`, and each user's
    * step-typed events are folded in (us, event_id) order by a
    * higher-order `aggregate` that appends a step time exactly when the
    * next expected type appears strictly later than the last matched
    * step — the greedy first-match, which IS the progressive
    * min-after-previous semantics. A K-stage join formulation would
    * recompute each survivor chain per stage (O(K²) scans — Spark
    * deduplicates exchanges, not arbitrary subplans); this is one scan,
    * one data shuffle, and a dimension-sized summary. The per-user
    * collect holds only step-typed events, and the deterministic
    * `sort_array` makes the fold a pure function of the data. All
    * timestamps are exact epoch-micro longs; the one double (`mean_lag
    * _us`) is a single division of exact integer sums, deterministic
    * across engines.
    *
    * Returns one row per stage: `(stage, step, n_users, mean_lag_us)` —
    * `n_users` monotonically non-increasing down the funnel, `mean_lag
    * _us` the average micros from the stage-0 event among users who
    * reached the stage (0 at stage 0, null for a stage nobody reached).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    val k = steps.size
    val stepArr = array(steps.map(lit): _*)
    val perUser = events
      .filter(col("event_type").isInCollection(steps))
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(
        col("user_id"),
        aggregate(
          col("evs"), array().cast("array<bigint>"),
          (ts, e) => when(
            size(ts) < k &&
              e.getField("event_type") === element_at(stepArr, size(ts) + 1) &&
              (size(ts) === 0 || e.getField("us") > element_at(ts, -1)),
            concat(ts, array(e.getField("us")))).otherwise(ts)).as("ts"))
      .filter(size(col("ts")) > 0)
    val reached = perUser
      .select(element_at(col("ts"), 1).as("t0"), posexplode(col("ts")))
      .groupBy(col("pos").as("stage"))
      .agg(
        count(lit(1)).as("n_reached"),
        sum(col("col") - col("t0")).as("_lag"))
    // Static stage dimension: a stage nobody reached must still report
    // (n_users = 0, mean null) instead of vanishing from the output.
    events.sparkSession
      .createDataFrame(steps.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("stage", "step")
      .join(broadcast(reached), Seq("stage"), "left_outer")
      .select(
        col("stage"), col("step"),
        coalesce(col("n_reached"), lit(0L)).as("n_users"),
        (col("_lag").cast("double") / col("n_reached").cast("double")).as("mean_lag_us"))
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

  /** Type-2 slowly-changing-dimension intervals from a change stream —
    * the warehouse-standard history build that turns per-event rows into
    * validity ranges: consecutive events with the SAME tracked attribute
    * collapse into one version, each version row carries
    * `[valid_from, valid_to)` (half-open; `valid_to` is the next
    * version's start), a 1-based `version` sequence, and `is_current` on
    * the open tail. Complements [[Curation.latestSnapshot]] (type-1
    * upsert: latest wins, history discarded) and
    * [[Curation.snapshotDiff]] (two-snapshot CDC): this keeps the FULL
    * attribute history queryable by as-of timestamp, which is what a
    * point-in-time training-feature join ([[Joins]]' as-of) needs to stay
    * leakage-free.
    *
    * Total order within an entity is `(ts, event_id)` — the same
    * deterministic tie-break every event-ordered operator here uses —
    * and run-collapse keeps the FIRST row of each run (a change event
    * opens its version at its own timestamp).
    *
    * `valid_to` surfaces as microseconds with `-1` for the current
    * (open) version: a sentinel rather than NULL keeps the column BIGINT
    * end to end on both engines (a NULL-able lead turns the oracle frame
    * float64, the exact dtype drift the gate is built to reject).
    * The sentinel assumes a nonnegative-epoch domain: a pre-1970
    * timestamp has a negative `unix_micros`, and `1969-12-31T23:59:59
    * .999999Z` in particular yields a genuine `valid_to_us` of `-1`
    * that would collide with the open-tail sentinel and mislabel
    * `is_current`. All event fixtures (and any realistic ingest
    * timeline) are post-epoch; callers with archival pre-1970 data
    * must shift or choose a different sentinel.
    *
    * Scale: one exchange on `user_id`; the lag, the post-filter lead, and
    * the version row_number all share that partitioning (same window
    * spec, no second shuffle). State is per-entity and bounded by change
    * count, never raw event count, after the first window collapses runs.
    */
  def scd2Intervals(
      events: DataFrame,
      tracked: Column = col("event_type")): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), tracked.as("attr"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("attr"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("attr"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_us", coalesce(unix_micros(lead(col("ts"), 1).over(w)), lit(-1L)))
      .select(
        col("user_id"),
        col("attr"),
        unix_micros(col("ts")).as("valid_from_us"),
        col("valid_to_us"),
        col("version"),
        (col("valid_to_us") === -1L).as("is_current"))
  }

  /** Tabular CUSUM change-point detection (Page 1954) over the
    * zero-filled daily event-count series, per type — the sequential
    * monitor that catches a SUSTAINED level shift [[dailyAnomalies]]'
    * pointwise z-score misses (ten days of +1.5σ never trips a 2σ
    * gate; their cumulative sum trips CUSUM on day three). Emits both
    * one-sided statistics and alarm flags per (type, day):
    * {{{
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − slack))   // upward shifts
    *   S⁻_t = max(0, S⁻_{t−1} − (x_t − μ + slack))   // downward shifts
    *   alarm when S± > h,  slack = μ div `slackDiv`,  h = μ·`hNum` div `hDen`
    * }}}
    *
    * The recurrences never evaluate as a fold: CUSUM has the closed
    * form `S⁺_t = P_t − min(0, min_{j≤t} P_j)` over the deviation
    * prefix sums `P_t = Σ_{i≤t}(x_i − μ − slack)` (and symmetrically
    * `S⁻_t = max(0, max_{j≤t} Q_j) − Q_t` for `Q` with `+slack`), so
    * both engines compute it with TWO window functions per side —
    * running sum and running extremum — on the same (type, day)
    * ordering. Everything is BIGINT (μ is a floor-divided mean;
    * deviations subtract — no division ever touches a negative), so
    * every statistic is engine-bit-identical.
    *
    * Scale: [[gapFill]]'s one aggregate + dimension-sized densify,
    * then per-type windows over a (types × days) table — dimension
    * work, independent of raw event volume.
    */
  def cusum(
      events: DataFrame,
      slackDiv: Long = 20L,
      hNum: Long = 1L,
      hDen: Long = 4L): DataFrame = {
    require(slackDiv > 0 && hDen > 0, "slackDiv and hDen must be positive")
    val filled = gapFill(events)
    val run = Window.partitionBy(col("event_type")).orderBy(col("epoch_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("mu", expr("sum(n) over (partition by event_type) div count(1) over (partition by event_type)"))
      .withColumn("slack", expr(s"mu div ${slackDiv}L"))
      .withColumn("h", expr(s"(mu * ${hNum}L) div ${hDen}L"))
      .withColumn("p", sum(col("n") - col("mu") - col("slack")).over(run))
      .withColumn("q", sum(col("n") - col("mu") + col("slack")).over(run))
      .withColumn("s_pos", col("p") - least(lit(0L), min(col("p")).over(run)))
      .withColumn("s_neg", greatest(lit(0L), max(col("q")).over(run)) - col("q"))
      .select(
        col("event_type"), col("epoch_day"), col("n"), col("mu"),
        col("s_pos"), col("s_neg"),
        (col("s_pos") > col("h")).as("alarm_up"),
        (col("s_neg") > col("h")).as("alarm_down"))
  }

  /** Gap sessionization: split each user's event stream into sessions
    * wherever consecutive events are more than `gapUs` microseconds
    * apart, then aggregate one row per (user, session) with event count
    * and first/last/duration in microseconds. Session ids are 0-based
    * per user in time order. This is the batch twin of
    * [[graft.streaming.StreamingOps]]' timeout sessionization, and the
    * session table q148's interval-overlap join runs over.
    *
    * Total order within a user is `(us, event_id)` — the standard
    * deterministic tie-break — so the gap flag, the running session id,
    * and the final aggregate are all reproducible cross-engine.
    *
    * Scale: ONE exchange on `user_id`; the lag window, the running-sum
    * window, and the (user, session) aggregate all share that
    * partitioning (the aggregate key is a prefix extension of the
    * window key), so Catalyst plans zero additional shuffles. State per
    * user is a single lag row — nothing accumulates — and the output is
    * session-count-sized, far below event count at 100 TB.
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L): DataFrame = {
    sessionLabels(events, gapUs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"))
      .withColumn("duration_us", col("last_us") - col("first_us"))
  }

  /** [[sessionize]]'s per-event half: every event labeled with its
    * 0-based per-user session id (same `(us, event_id)` total order and
    * running gap sum), `event_type` carried through for consumers that
    * aggregate WITHIN sessions ([[Association.sequentialPairs]]).
    * Same single `user_id` exchange shared by both windows.
    */
  def sessionLabels(events: DataFrame, gapUs: Long = 1800L * 1000000L): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn(
        "new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(run).cast("int"))
      .drop("new_sess")
  }

  /** Seasonality-adjusted ingest anomalies — the day-of-week-aware
    * detector next to [[dailyAnomalies]]' global z-score and [[cusum]]'s
    * shift test: a Sunday dip that happens EVERY Sunday is a pattern,
    * not an incident, and a global baseline flags it weekly. Per
    * (type, day) over [[gapFill]]'s zero-filled daily series: the
    * day-of-week (0 = Sunday, epoch day 0 = Thursday), the per-(type,
    * dow) MEDIAN baseline, the residual `n − baseline`, and
    * `is_anomaly = |residual| > k·1.4826·MAD₀` with MAD₀ the per-type
    * median of |residual| (residuals center near zero by construction —
    * the STL-residual convention). Medians are `percentile` ≡
    * `quantile_cont` interpolation (the q71/q176 parity) and the rest
    * fixed IEEE trees — bit-identical across engines; a zero-MAD type
    * (perfectly weekly-periodic) yields no finite threshold and FALSE
    * flags.
    *
    * Scale: everything downstream of the one events scan is
    * dimension-sized — (type × day) cells, (type × 7) baselines, and a
    * types-sized MAD table, the last two broadcast back.
    */
  def seasonalResiduals(events: DataFrame, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val daily = gapFill(events)
      .withColumn("dow", pmod(col("epoch_day") + 4L, lit(7L)))
    val base = daily.groupBy(col("event_type"), col("dow"))
      .agg(expr("percentile(n, 0.5)").as("baseline"))
    val res = daily.join(broadcast(base), Seq("event_type", "dow"))
      .withColumn("residual", col("n").cast("double") - col("baseline"))
    val mad = res.groupBy(col("event_type"))
      .agg(expr("percentile(abs(residual), 0.5)").as("mad0"))
    res.join(broadcast(mad), Seq("event_type"))
      .select(
        col("event_type"), col("epoch_day"), col("dow"), col("n"),
        col("baseline"), col("residual"), col("mad0"),
        (col("mad0") > 0d &&
          abs(col("residual")) > lit(k) * lit(1.4826) * col("mad0")).as("is_anomaly"))
  }

  /** Lagged cross-correlation between two daily event-count series —
    * "does a click spike predict a purchase spike l days later, and at
    * which lag?" For each lag 0..maxLag over the overlapping days, the
    * exact Pearson pieces as integers: `num = n·Σxy − Σx·Σy` (sign =
    * correlation direction) and `r² = num²/(d1·d2)` in exact ppm via
    * DECIMAL(38,0)/HUGEINT — the argmax-lag row is the lead-time
    * estimate. Zero-variance windows (d1/d2 = 0) yield NULL r², not a
    * division error.
    *
    * Scale: one map-side-combined daily aggregate (state = days ×
    * types, calendar-bounded), then a lag-replicated join of two
    * day-count tables — (maxLag+1)·days rows, never event rows — and a
    * lags-sized aggregate. Headroom: `n_days·Σxy` within BIGINT to
    * ~10⁶ events/day over ~10³ days; num² is carried in 128-bit.
    */
  def lagCorrelation(
      events: DataFrame,
      typeA: String = "click",
      typeB: String = "purchase",
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 0 && maxLag <= 366, s"maxLag=$maxLag out of range [0, 366]")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val daily = events
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(
        unix_date(to_date(col("ts"))).cast("long").as("epoch_day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val a = daily.filter(col("event_type") === typeA)
      .select(col("epoch_day"), col("n").as("na"))
    val b = daily.filter(col("event_type") === typeB)
      .select(col("epoch_day").as("bday"), col("n").as("nb"))
    val lags = events.sparkSession.range(0L, maxLag + 1L).toDF("lag")
    a.crossJoin(broadcast(lags))
      .withColumn("bday", col("epoch_day") + col("lag"))
      .join(b, Seq("bday"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("na")).as("sx"), sum(col("nb")).as("sy"),
        sum(col("na") * col("na")).as("sxx"),
        sum(col("nb") * col("nb")).as("syy"),
        sum(col("na") * col("nb")).as("sxy"))
      .withColumn("num", col("n_days") * col("sxy") - col("sx") * col("sy"))
      .withColumn("d1", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", col("n_days") * col("syy") - col("sy") * col("sy"))
      .withColumn(
        "corr_sign",
        when(col("num") > 0L, 1L).when(col("num") < 0L, -1L).otherwise(0L))
      .withColumn("_n", lit(1000000L).cast(dec) * col("num").cast(dec) * col("num").cast(dec))
      .withColumn("_d", col("d1").cast(dec) * col("d2").cast(dec))
      .withColumn(
        "r2_ppm",
        when(col("d1") > 0L && col("d2") > 0L, expr("_n div _d").cast("long")))
      .select(
        col("lag"), col("n_days"), col("sxy"), col("num"),
        col("corr_sign"), col("r2_ppm"))
  }

  /** Rolling distinct active users — the WAU/MAU curve: for every day in
    * the observed range, how many DISTINCT users had at least one event
    * in the trailing `windowDays`-day window ending that day.
    *
    * The textbook formulation (`COUNT(DISTINCT user)` per day over a
    * day-grid range join) re-counts every user-day up to `windowDays`
    * times and holds per-day distinct state — the classic scale cliff.
    * This is the sweep-line shape instead: a user's active day `a`
    * covers days `[a, a+W−1]`, so per user the covered days form a
    * UNION OF INTERVALS; overlapping intervals merge (chain-break when
    * the gap to the previous active day exceeds `W−1`, interval id =
    * running break count), each merged interval contributes `+1` at its
    * start day and `−1` past its end, and the rolling distinct count is
    * the running sum of those deltas — no distinct state anywhere.
    *
    * Scale: one exchange on `user_id` (the distinct user-day pass; the
    * break/interval windows reuse that partitioning), then the delta
    * table is at most 2 rows per merged interval and the final running
    * sum runs over a DAYS-sized frame — timeline-bounded, not
    * data-bounded, exactly like [[dailyAnomalies]]' calendar. Output is
    * one row per day in `[min_day, max_day]` (BIGINT epoch days):
    * `(day, n_active)`, carryover from pre-range activity included by
    * construction.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    val w = windowDays.toLong
    val ud = events
      .select(col("user_id"), unix_date(to_date(col("ts"))).cast("long").as("d"))
      .distinct()
    val wu = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val intervals = ud
      .withColumn("prev_d", lag(col("d"), 1).over(wu))
      .withColumn(
        "brk",
        when(col("prev_d").isNull || col("d") - col("prev_d") > w - 1L, 1L).otherwise(0L))
      .withColumn("iv", sum(col("brk")).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("iv"))
      .agg(min(col("d")).as("s"), (max(col("d")) + (w - 1L)).as("e"))
    val deltas = intervals
      .select(explode(array(
        struct(col("s").as("day"), lit(1L).as("delta")),
        struct((col("e") + 1L).as("day"), lit(-1L).as("delta")))).as("de"))
      .select(col("de.day"), col("de.delta"))
      .groupBy(col("day"))
      .agg(sum(col("delta")).as("delta"))
    val range = ud.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val grid = range.select(explode(sequence(col("lo"), col("hi"))).as("day"))
    // Bounded-input invariant (r21 window audit): the running sum walks
    // the DAY GRID (one row per day in [lo, hi]) — calendar-bounded,
    // never the interval rows.
    val wDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(deltas, Seq("day"), "left")
      .withColumn("n_active", sum(coalesce(col("delta"), lit(0L))).over(wDay))
      .select(col("day"), col("n_active"))
  }
}

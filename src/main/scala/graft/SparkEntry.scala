package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TrainingPipeline
import graft.sources.{EventFixtures, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is written determinism-first so the DuckDB oracle
  * hash-matches bit-for-bit:
  *  - total ORDER BY on a unique key set in both engines;
  *  - money/measure aggregates in exact DECIMAL, cast to double at the end
  *    (exact arithmetic → identical doubles regardless of fold order);
  *  - timestamps surfaced as epoch-microsecond longs (`unix_micros` /
  *    DuckDB `epoch_us`), never as raw timestamp columns;
  *  - per-row double math restricted to single correctly-rounded IEEE ops
  *    (one division, one sqrt), which both engines compute identically.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    TrainingPipeline.produceTrainingExamples(
      EventFixtures.impressions(spark, dir),
      EventFixtures.clicks(spark, dir),
      EventFixtures.addToCarts(spark, dir),
      EventFixtures.orders(spark, dir),
      maxHistory = TrainingPipeline.DefaultMaxHistory)
  }

  private val MaxHist = 8

  private def dec(c: String): org.apache.spark.sql.Column = col(c).cast(DecimalType(18, 4))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O1 — normalize 3 heterogeneous action streams (SURVEY §2.1).
    "q01_normalize_actions" -> ((s, dir) =>
      TrainingPipeline.normalizeActions(
        EventFixtures.clicks(s, dir),
        EventFixtures.addToCarts(s, dir),
        EventFixtures.orders(s, dir))
        .select(
          col("customer_id"), col("item_id"),
          unix_micros(col("action_time")).as("action_us"), col("action_type"))
        .orderBy("customer_id", "action_us", "item_id", "action_type")),

    // O2 — carousel unnest with position + label (SURVEY §2.1).
    "q02_explode_impressions" -> ((s, dir) =>
      TrainingPipeline.explodeImpressions(EventFixtures.impressions(s, dir))
        .orderBy("dt", "ranking_id", "customer_id", "impression_pos")),

    // O4 — full training-example pipeline (flagship; SURVEY §2.1, §3.1).
    "q03_training_examples" -> ((s, dir) =>
      TrainingPipeline.produceTrainingExamples(
        EventFixtures.impressions(s, dir),
        EventFixtures.clicks(s, dir),
        EventFixtures.addToCarts(s, dir),
        EventFixtures.orders(s, dir),
        maxHistory = MaxHist)
        .orderBy("dt", "ranking_id", "customer_id", "impression_pos", "impression_item_id")),

    // O3 — materialized per-(customer, dt) history precompute (SURVEY §2.1).
    "q04_customer_history" -> ((s, dir) => {
      val actions = TrainingPipeline.normalizeActions(
        EventFixtures.clicks(s, dir),
        EventFixtures.addToCarts(s, dir),
        EventFixtures.orders(s, dir))
      val dts = EventFixtures.impressions(s, dir).select("dt").distinct()
      TrainingPipeline.customerHistoryBeforeDt(actions, dts, MaxHist)
        .orderBy("customer_id", "dt")
    }),

    // O4 via O3: precomputed-history variant — must agree with q03 exactly.
    "q05_training_examples_precomputed" -> ((s, dir) => {
      val actions = TrainingPipeline.normalizeActions(
        EventFixtures.clicks(s, dir),
        EventFixtures.addToCarts(s, dir),
        EventFixtures.orders(s, dir))
      val imps = EventFixtures.impressions(s, dir)
      val hist = TrainingPipeline.customerHistoryBeforeDt(
        actions, imps.select("dt").distinct(), MaxHist)
      TrainingPipeline.produceTrainingExamplesPrecomputed(imps, hist, MaxHist)
        .orderBy("dt", "ranking_id", "customer_id", "impression_pos", "impression_item_id")
    }),

    // Hash aggregation with exact-decimal measures (TPC-H Q1 shape).
    "q06_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Multi-way join: fact × fact × dim × broadcast dim (TPC-H Q5 shape).
    "q07_revenue_by_nation" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec("l_discount")))
            .cast("double").as("revenue"),
          count_distinct(col("o_orderkey")).as("n_orders"))
        .orderBy("n_name")),

    // Windowed per-group top-K (SURVEY §2.5).
    "q08_top_orders_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rnk")
    }),

    // Anti join (left_anti — SURVEY §2.8 gap, now covered).
    "q09_customers_without_orders" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Semi join + aggregation.
    "q10_segments_with_orders" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Sessionization: gap-based (30 min) via lag + running sum — the batch
    // twin of the streaming session-window operator.
    "q11_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn(
          "new_sess",
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(run).cast("int"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("us")).as("first_us"),
          max(col("us")).as("last_us"))
        .withColumn("duration_us", col("last_us") - col("first_us"))
        .orderBy("user_id", "session_id")
    }),

    // Multi-key aggregation over the event stream with exact-decimal sum.
    "q12_daily_event_stats" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")))

  /** Shared oracle CTE: the events stream exactly as Spark sees it (DuckDB
    * already truncates the parquet ns timestamps to µs the same way our
    * `ts DIV 1000` read does).
    */
  private val evActions =
    """actions AS (
      |  SELECT user_id AS customer_id,
      |         event_id % 1000 AS item_id,
      |         ts AS action_time,
      |         CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 ELSE 3 END AS action_type
      |  FROM events WHERE event_type IN ('click','view','purchase')
      |)""".stripMargin

  private val evImpressions =
    """imp AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
      |         CAST(MIN(event_id) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS VARCHAR) AS ranking_id,
      |         user_id AS customer_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY event_id) - 1 AS INT) AS impression_pos,
      |         event_id % 1000 AS impression_item_id,
      |         CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS INT) AS label,
      |         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS cutoff_ts
      |  FROM events WHERE event_type = 'purchase'
      |)""".stripMargin

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(

    "q01_normalize_actions" ->
      s"""WITH $evActions
         |SELECT customer_id, item_id, epoch_us(action_time) AS action_us, action_type
         |FROM actions
         |ORDER BY customer_id, action_us, item_id, action_type""".stripMargin,

    "q02_explode_impressions" ->
      s"""WITH $evImpressions
         |SELECT dt, ranking_id, customer_id, impression_pos, impression_item_id, label
         |FROM imp
         |ORDER BY dt, ranking_id, customer_id, impression_pos""".stripMargin,

    "q03_training_examples" -> trainingExamplesOracle,

    "q04_customer_history" ->
      s"""WITH $evActions,
         |dts AS (
         |  SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
         |         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS cutoff_ts
         |  FROM events WHERE event_type = 'purchase'
         |),
         |ranked AS (
         |  SELECT d.dt, a.customer_id, a.item_id, a.action_type,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY a.customer_id, d.dt
         |           ORDER BY a.action_time DESC, a.item_id, a.action_type) AS rn
         |  FROM actions a JOIN dts d ON a.action_time < d.cutoff_ts
         |),
         |agg AS (
         |  SELECT customer_id, dt,
         |         list(item_id ORDER BY rn) FILTER (WHERE rn <= 8) AS acts,
         |         list(action_type ORDER BY rn) FILTER (WHERE rn <= 8) AS atys
         |  FROM ranked
         |  GROUP BY customer_id, dt
         |)
         |SELECT customer_id, dt,
         |       (COALESCE(acts, CAST([] AS BIGINT[])) || CAST([0,0,0,0,0,0,0,0] AS BIGINT[]))[1:8] AS actions,
         |       (COALESCE(atys, CAST([] AS INT[])) || CAST([0,0,0,0,0,0,0,0] AS INT[]))[1:8] AS action_types
         |FROM agg
         |ORDER BY customer_id, dt""".stripMargin,

    "q05_training_examples_precomputed" -> trainingExamplesOracle,

    "q06_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q07_revenue_by_nation" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |       COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q08_top_orders_per_customer" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q09_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_segments_with_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q11_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |),
        |sess AS (
        |  SELECT user_id, us,
        |         CAST(SUM(new_sess) OVER (
        |           PARTITION BY user_id ORDER BY us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(us) AS first_us, MAX(us) AS last_us,
        |       MAX(us) - MIN(us) AS duration_us
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q12_daily_event_stats" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin)

  private def trainingExamplesOracle: String =
    s"""WITH $evActions,
       |$evImpressions,
       |joined AS (
       |  SELECT i.dt, i.ranking_id, i.customer_id, i.impression_pos,
       |         i.impression_item_id, i.label,
       |         a.item_id, a.action_type, a.action_time
       |  FROM imp i LEFT JOIN actions a
       |    ON i.customer_id = a.customer_id AND a.action_time < i.cutoff_ts
       |),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY dt, ranking_id, customer_id, impression_pos, impression_item_id
       |      ORDER BY action_time DESC, item_id, action_type) AS rn
       |  FROM joined
       |),
       |agg AS (
       |  SELECT dt, ranking_id, customer_id, impression_pos, impression_item_id, label,
       |         list(item_id ORDER BY rn) FILTER (WHERE action_time IS NOT NULL AND rn <= 8) AS acts,
       |         list(action_type ORDER BY rn) FILTER (WHERE action_time IS NOT NULL AND rn <= 8) AS atys
       |  FROM ranked
       |  GROUP BY dt, ranking_id, customer_id, impression_pos, impression_item_id, label
       |)
       |SELECT dt, ranking_id, customer_id, impression_pos, impression_item_id, label,
       |       (COALESCE(acts, CAST([] AS BIGINT[])) || CAST([0,0,0,0,0,0,0,0] AS BIGINT[]))[1:8] AS actions,
       |       (COALESCE(atys, CAST([] AS INT[])) || CAST([0,0,0,0,0,0,0,0] AS INT[]))[1:8] AS action_types
       |FROM agg
       |ORDER BY dt, ranking_id, customer_id, impression_pos, impression_item_id""".stripMargin
}

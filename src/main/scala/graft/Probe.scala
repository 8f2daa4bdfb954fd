package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TrainingPipeline
import graft.sources.EventFixtures

/** Scale probes — not part of the driver contract; run manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Probe"
  * }}}
  *
  * 1. O3 dt-scaling: with the two-stage chunked plan, `customerHistoryBeforeDt`
  *    work must scale with OUTPUT rows, not with actions × cutoffs. Probe:
  *    same actions, 1× vs 10× the cutoff days; pass = time ratio ≤ 1.5 ×
  *    output-row ratio. A horizon-bounded run shows the production knob
  *    (bounded lookback ⇒ far cutoffs do no work at all).
  *
  * 2. Skew salting: one synthetic hot customer owning ~20% of the action
  *    table, with auto-broadcast disabled — at 100 TB the action table
  *    cannot broadcast, so the join is sort-merge and the hot key pins one
  *    partition. (With broadcast enabled the probe side spreads hot rows
  *    evenly and salting is pure overhead — which is why salting must stay
  *    opt-in.) Pass = targeted (hot-keys-only) salting beats unsalted.
  */
object Probe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val actions = TrainingPipeline.normalizeActions(
      EventFixtures.clicks(spark, sfDir),
      EventFixtures.addToCarts(spark, sfDir),
      EventFixtures.orders(spark, sfDir))
      .persist()
    actions.count()

    // --- Probe 1: O3 time vs number of distinct cutoff days -------------
    val dts1 = EventFixtures.impressions(spark, sfDir).select("dt").distinct().persist()
    val n1 = dts1.count()
    // 10×: shift each real dt forward by 0..9 * 100 days — every synthetic
    // cutoff still sees the full history (unbounded lookback), so output
    // grows ~10× by construction.
    val dts10 = dts1
      .crossJoin(spark.range(10).toDF("k"))
      .select(date_format(expr("to_date(dt) + make_interval(0,0,0,k*100)"), "yyyy-MM-dd").as("dt"))
      .distinct().persist()
    val n10 = dts10.count()

    def o3(d: DataFrame, horizon: Option[Int] = None): DataFrame =
      TrainingPipeline.customerHistoryBeforeDt(actions, d, 8, horizon)
    val rows1 = o3(dts1).count()
    val rows10 = o3(dts10).count()
    drain(o3(dts1)) // warm-up
    val t1 = (1 to 2).map(_ => time(drain(o3(dts1)))).min
    val t10 = (1 to 2).map(_ => time(drain(o3(dts10)))).min
    val tH = (1 to 2).map(_ => time(drain(o3(dts10, horizon = Some(45))))).min
    val rowRatio = rows10.toDouble / rows1
    val timeRatio = t10 / t1
    println(f"""{"probe":"o3_dt_scaling","dts_1x":$n1,"dts_10x":$n10,"rows_1x":$rows1,"rows_10x":$rows10,"sec_1x":$t1%.3f,"sec_10x":$t10%.3f,"sec_10x_horizon45":$tH%.3f,"time_ratio":$timeRatio%.2f,"row_ratio":$rowRatio%.2f,"pass":${timeRatio <= 1.5 * rowRatio}}""")

    // --- Probe 2: salted vs unsalted join under one hot customer --------
    // Reassign ~20% of all actions to customer 1 and run the flagship
    // pipeline with auto-broadcast off (the 100 TB regime: a fact×fact
    // sort-merge join where the hot key lands in one partition).
    val skewed = actions
      .withColumn("customer_id", when(pmod(col("item_id"), lit(5)) === 0, lit(1L)).otherwise(col("customer_id")))
      .persist()
    skewed.count()
    val imps = EventFixtures.impressions(spark, sfDir)
      .withColumn("customer_id", when(pmod(col("ranking_id").cast("long"), lit(4)) === 0, lit(1L)).otherwise(col("customer_id")))
      .persist()
    imps.count()
    // Force the SMJ regime and mask AQE's own skew mitigation — the
    // mechanism under test is the explicit salt. Partition coalescing is
    // also off: it sizes by INPUT shuffle bytes (a few MB here) and would
    // merge the salted sub-keys back into one task, blind to the join's
    // multi-million-row OUTPUT — at real scale inputs are big enough that
    // it never triggers.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val hot = TrainingPipeline.detectHotCustomers(skewed, threshold = 5000L)

    def flagship(salt: Option[Int], hotOnly: Option[Seq[Long]]): Unit = drain(
      TrainingPipeline.produceTrainingExamplesFromActions(
        imps, skewed, 8, saltBuckets = salt, saltOnlyCustomers = hotOnly))
    flagship(None, None) // warm-up
    val tPlain = (1 to 2).map(_ => time(flagship(None, None))).min
    val tSaltAll = (1 to 2).map(_ => time(flagship(Some(8), None))).min
    val tSaltHot = (1 to 2).map(_ => time(flagship(Some(8), Some(hot)))).min
    println(f"""{"probe":"salted_skew_join","hot_customers":${hot.length},"sec_plain":$tPlain%.3f,"sec_salt_all":$tSaltAll%.3f,"sec_salt_hot":$tSaltHot%.3f,"speedup_hot":${tPlain / tSaltHot}%.2f,"pass":${tSaltHot < tPlain}}""")

    // --- Probe 3: precomputed O3 histories vs the direct flagship -------
    // The reference README's production claim (README.md:69-72): when
    // training runs recur over the same days, materialize the
    // per-(customer, dt) history table once and join each run against it,
    // instead of re-ranking raw actions per run. Modeled as `runs`
    // repeated flagship executions: the direct path pays the
    // actions-join + window every time; the precompute path pays O3 once
    // (persisted, standing in for the production parquet table) and then
    // only the cheap (customer, dt) equi-join per run.
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val impsReal = EventFixtures.impressions(spark, sfDir).persist()
    impsReal.count()
    val runs = 5
    def direct(): Unit =
      TrainingPipeline.produceTrainingExamplesFromActions(impsReal, actions, 8)
        .write.format("noop").mode("overwrite").save()
    direct() // warm-up
    val tDirect = (1 to runs).map(_ => time(direct())).sum
    val hist = TrainingPipeline
      .customerHistoryBeforeDt(actions, impsReal.select("dt").distinct(), 8)
      .persist()
    val tBuild = time { hist.count() }
    def viaPrecomputed(): Unit =
      TrainingPipeline.produceTrainingExamplesPrecomputed(impsReal, hist, 8)
        .write.format("noop").mode("overwrite").save()
    viaPrecomputed() // warm-up
    val tPre = (1 to runs).map(_ => time(viaPrecomputed())).sum
    val tPreTotal = tBuild + tPre
    println(f"""{"probe":"precomputed_flagship","runs":$runs,"sec_direct_total":$tDirect%.3f,"sec_o3_build":$tBuild%.3f,"sec_precomputed_runs":$tPre%.3f,"sec_precomputed_total":$tPreTotal%.3f,"speedup":${tDirect / tPreTotal}%.2f,"pass":${tPreTotal < tDirect}}""")

    spark.stop()
  }
}

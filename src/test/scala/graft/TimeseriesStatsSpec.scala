package graft

import org.apache.spark.sql.functions._

import graft.functions.Stats
import graft.operators.Timeseries

class TimeseriesStatsSpec extends SparkSpec {

  import spark.implicits._

  // Day 19723 = 2024-01-01. Three days with a gap on day 2 for type "a".
  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 10L, "a", 1.0, "{}"),
    (2L, ts("2024-01-01 11:00:00"), 11L, "b", 1.0, "{}"),
    (3L, ts("2024-01-03 10:00:00"), 10L, "a", 1.0, "{}"),
    (4L, ts("2024-01-02 10:00:00"), 12L, "b", 1.0, "{}"),
    (5L, ts("2024-01-03 10:00:00"), 10L, "b", 1.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gap fill emits every (type, day) cell with explicit zeros") {
    val r = Timeseries.gapFill(events).orderBy("event_type", "epoch_day").collect()
    // 2 types × 3 days — the empty (a, day2) and (b, day3)... all cells present.
    assert(r.length === 6)
    val cells = r.map(x =>
      (x.getAs[String]("event_type"), x.getAs[Long]("epoch_day")) -> x.getAs[Long]("n")).toMap
    val d0 = cells.keys.map(_._2).min
    assert(cells(("a", d0)) === 1L)
    assert(cells(("a", d0 + 1)) === 0L) // the gap, zero-filled not dropped
    assert(cells(("a", d0 + 2)) === 1L)
    assert(cells(("b", d0 + 1)) === 1L)
    assert(r.map(_.getAs[Long]("n")).sum === 5L)
  }

  test("cohort retention counts distinct users per (cohort, offset)") {
    val r = Timeseries.cohortRetention(events).collect()
    val cells = r.map(x =>
      (x.getAs[Long]("cohort_day"), x.getAs[Long]("day_offset")) -> x.getAs[Long]("n_active")).toMap
    val d0 = cells.keys.map(_._1).min
    // Users 10, 11 first seen day 0; user 12 first seen day 1.
    assert(cells((d0, 0L)) === 2L)
    assert(cells((d0, 2L)) === 1L) // only user 10 returns on day 2
    assert(cells((d0 + 1, 0L)) === 1L)
  }

  test("exact moments match closed-form mean/variance bit-for-bit") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 6L), ("h", 5L))
      .toDF("k", "x")
    val r = Stats.exactMoments(df, col("k"), col("x")).orderBy("grp").collect()
    val g = r(0)
    assert(g.getAs[Long]("n") === 4L)
    assert(g.getAs[Double]("mean") === 3.0)
    // var = (4*50 - 12²)/16 = 56/16 = 3.5 exactly.
    assert(g.getAs[Double]("variance") === 3.5)
    assert(g.getAs[Double]("stddev") === math.sqrt(3.5))
    val h = r(1)
    assert(h.getAs[Double]("variance") === 0.0)
  }

  test("gap fill zero-runs cover leading and trailing edges of the global span") {
    // Type "c" is active ONLY on the middle day of a 3-day global span:
    // its row must densify to a leading zero (day 0) AND a trailing zero
    // (day 2) — the two window-fill branches a middle-gap case never hits.
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "a", 1.0, "{}"),
      (2L, ts("2024-01-03 10:00:00"), 10L, "a", 1.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 11L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val r = Timeseries.gapFill(e).orderBy("event_type", "epoch_day").collect()
    assert(r.length === 6)
    val c = r.filter(_.getAs[String]("event_type") == "c").map(_.getAs[Long]("n")).toSeq
    assert(c === Seq(0L, 1L, 0L))
    // Zero-persist contract: the operator must not leave NEW cached
    // blocks behind (the round-4 leak — one cache entry per invocation).
    assert(spark.sparkContext.getPersistentRDDs.keySet === cachedBefore)
  }

  test("exact moments stay exact past the long-wrap regime") {
    // Σx² = 1.6e19 overflows a signed long (9.2e18); the decimal(38,0)
    // sufficient statistics must still give the exact population
    // variance of {0, 4e9}: (4e9)²/4 = 4e18 (exactly representable).
    val df = Seq(("g", 0L), ("g", 4000000000L)).toDF("k", "x")
    val r = Stats.exactMoments(df, col("k"), col("x")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("mean") === 2.0e9)
    assert(r(0).getAs[Double]("variance") === 4.0e18)
  }

  test("winsorize clips to the group quantiles, leaving interior values alone") {
    // Group g: values 0..100 → p05 = 5, p95 = 95 under linear interpolation.
    val df = (0L to 100L).map(x => ("g", x, x.toDouble)).toDF("k", "id", "x")
    val r = Stats.winsorize(df, col("k"), col("id"), col("x")).orderBy("id").collect()
    assert(r.length === 101)
    assert(r(0).getAs[Double]("x_clipped") === 5.0)    // below p05 → clipped up
    assert(r(3).getAs[Double]("x_clipped") === 5.0)
    assert(r(50).getAs[Double]("x_clipped") === 50.0)  // interior untouched
    assert(r(100).getAs[Double]("x_clipped") === 95.0) // above p95 → clipped down
    // Originals pass through for the audit.
    assert(r(100).getAs[Double]("x") === 100.0)
  }

  test("approx quantiles hold the GK rank-error bound across partitionings") {
    // 20,000 distinct values in one group: value v has exact rank v, so
    // the rank error of the sketch's answer is directly readable. The GK
    // guarantee is rank error ≤ n/accuracy; check it at two accuracies
    // and under two different partitionings (the MERGE path must not
    // degrade the bound — that's the property that makes it the 100 TB
    // path).
    val n = 20000
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    for (parts <- Seq(1, 16); accuracy <- Seq(100, 1000)) {
      val df = spark.range(1, n + 1).repartition(parts)
        .selectExpr("'g' AS k", "CAST(id AS DOUBLE) AS x")
      val r = Stats.approxQuantiles(df, col("k"), col("x"), ps, accuracy)
        .collect().head
      assert(r.getAs[Long]("n") === n.toLong)
      val aq = r.getAs[scala.collection.Seq[Double]]("aq")
      ps.zip(aq).foreach { case (p, v) =>
        val rankErr = math.abs(v - p * n) // rank(v) = v on this data
        assert(rankErr <= n.toDouble / accuracy + 1,
          s"p=$p accuracy=$accuracy parts=$parts: cutoff $v, rank error $rankErr > ${n / accuracy}")
      }
      // The checkable gate agrees: every (group, p) row passes.
      val checked = Stats.approxQuantileRankCheck(df, col("k"), col("x"), ps, accuracy)
        .collect()
      assert(checked.length === ps.size)
      assert(checked.forall(_.getAs[Boolean]("rank_ok")))
    }
  }

  test("transition matrix counts consecutive per-user steps in (ts, event_id) order") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 10L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 10L, "buy", 1.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 11L, "view", 1.0, "{}"),
      (5L, ts("2024-01-01 10:03:00"), 11L, "click", 1.0, "{}"),
      // Same-timestamp tie for user 12: event_id breaks it → view→click.
      (6L, ts("2024-01-01 12:00:00"), 12L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 12:00:00"), 12L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Timeseries.transitionMatrix(e).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) -> r.getAs[Long]("n"))
      .toMap
    assert(m === Map(("view", "click") -> 3L, ("click", "buy") -> 1L))
  }

  test("redactPii replaces emails and long digit runs, counting hits on the original text") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (0L, "contact alice.smith+x@example.co.uk or call 12345678 now", "en", "s0", 50L),
      (1L, "short 123456 stays, but 1234567 goes", "en", "s0", 30L),
      (2L, "nothing sensitive here", "en", "s0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.redactPii(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("clean_text") === "contact [EMAIL] or call [NUMBER] now")
    assert(r(0).getAs[Long]("n_emails") === 1L)
    assert(r(0).getAs[Long]("n_numbers") === 1L)
    assert(r(1).getAs[String]("clean_text") === "short 123456 stays, but [NUMBER] goes")
    assert(r(1).getAs[Long]("n_numbers") === 1L)
    assert(r(2).getAs[String]("clean_text") === "nothing sensitive here")
    assert(r(2).getAs[Long]("n_emails") === 0L)
  }

  test("equi-width histogram buckets span [lo, hi] with max in the last bin") {
    val df = (0L to 100L).map(x => Tuple1(x)).toDF("x")
    val r = Stats.equiWidthHistogram(df, col("x"), bins = 10).orderBy("bin").collect()
    assert(r.length === 10)
    assert(r.head.getAs[Int]("bin") === 0)
    assert(r.last.getAs[Int]("bin") === 9)
    // 101 values over width ⌈101/10⌉: bins 0..9 hold 11,10,10,... per the
    // floor formula; total conserved and hi lands in the final bin.
    assert(r.map(_.getAs[Long]("n")).sum === 101L)
    assert(r.last.getAs[Long]("x_max") === 100L)
    assert(r.head.getAs[Long]("x_min") === 0L)
    // Bin edges are non-overlapping and ordered.
    val pairs = r.map(x => (x.getAs[Long]("x_min"), x.getAs[Long]("x_max")))
    pairs.sliding(2).foreach { case Array((_, aMax), (bMin, _)) => assert(aMax < bMin) }
  }

  test("daily anomalies flag the spike day and leave steady days unflagged") {
    // Type "a": counts (1, 1, 1, 1, 6) over five days — mean 2, var 4,
    // stddev 2; the spike day's z = (6-2)/2 = 2 (NOT > 2 → unflagged at
    // the default threshold), steady days z = -0.5. Threshold 1.9 flags
    // exactly the spike.
    val rows = (0 until 4).flatMap(d =>
      Seq((d.toLong, ts(s"2024-01-0${d + 1} 10:00:00"), 1L, "a", 1.0, "{}"))) ++
      (0 until 6).map(i =>
        (100L + i, ts("2024-01-05 10:00:00"), 1L, "a", 1.0, "{}"))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Timeseries.dailyAnomalies(e, threshold = 1.9)
      .orderBy("epoch_day").collect()
    assert(r.length === 5)
    assert(r.map(_.getAs[Boolean]("is_anomaly")).toSeq ===
      Seq(false, false, false, false, true))
    assert(r.last.getAs[Double]("z") === 2.0)
    assert(r.head.getAs[Double]("mean") === 2.0)
    // Default threshold 2.0: strict inequality leaves even the spike off.
    val strict = Timeseries.dailyAnomalies(e).orderBy("epoch_day").collect()
    assert(strict.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("daily anomalies never flag a zero-variance source (stddev=0 → z null)") {
    // A perfectly steady source: one event per day, stddev 0. An
    // unguarded division would THROW under Spark ANSI mode (DuckDB
    // returns NULL); the guarded operator emits z = NULL and an
    // explicit is_anomaly = false for every day.
    val e = (0 until 4).map(d =>
      (d.toLong, ts(s"2024-02-0${d + 1} 10:00:00"), 1L, "steady", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Timeseries.dailyAnomalies(e).collect()
    assert(r.length === 4)
    assert(r.forall(_.isNullAt(r.head.fieldIndex("z"))))
    assert(r.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("ewma smoothing: half-life-one-day weights over the gap-filled series") {
    // Type "a": day0 n=1, day1 gap (→ 0), day2 n=1. The EWMA must see
    // the gap day as a true zero pulling the trend down.
    val r = Timeseries.ewmaSmooth(events, windowDays = 7)
      .filter(col("event_type") === "a").orderBy("epoch_day").collect()
    assert(r.length === 3)
    val e = r.map(_.getAs[Double]("ewma"))
    assert(e(0) === 1.0)                    // only itself
    assert(e(1) === 0.5 / 1.5)              // (0·1 + 1·½) / (1 + ½)
    assert(e(2) === 1.25 / 1.75)            // (1·1 + 0·½ + 1·¼) / 1.75
    // All three values are exact ratios of dyadic rationals — the ===
    // above is intentionally bitwise, no tolerance.
  }

  test("ewma with windowDays=0 degenerates to the series itself") {
    val r = Timeseries.ewmaSmooth(events, windowDays = 0).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Double]("ewma") === x.getAs[Long]("n_events").toDouble))
  }

  test("funnel counts only strictly-ordered step sequences") {
    // u1: full ordered conversion. u2: view BEFORE signup (must not
    // count at stage 1). u3: signup→view→purchase, no click (purchase
    // must not leapfrog the missing step). u4: never signs up.
    // u5: view at the SAME instant as signup (strictness: not counted).
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0, "{}"),
      (4L, ts("2024-01-01 14:00:00"), 1L, "purchase", 1.0, "{}"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}"),
      (6L, ts("2024-01-01 10:00:00"), 2L, "signup", 1.0, "{}"),
      (7L, ts("2024-01-01 10:00:00"), 3L, "signup", 1.0, "{}"),
      (8L, ts("2024-01-01 11:00:00"), 3L, "view", 1.0, "{}"),
      (9L, ts("2024-01-01 12:00:00"), 3L, "purchase", 1.0, "{}"),
      (10L, ts("2024-01-01 10:00:00"), 4L, "view", 1.0, "{}"),
      (11L, ts("2024-01-01 11:00:00"), 4L, "click", 1.0, "{}"),
      (12L, ts("2024-01-01 10:00:00"), 5L, "signup", 1.0, "{}"),
      (13L, ts("2024-01-01 10:00:00"), 5L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Timeseries.funnel(e, Seq("signup", "view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(r.map(_.getAs[String]("step")).toSeq ===
      Seq("signup", "view", "click", "purchase"))
    assert(r.map(_.getAs[Long]("n_users")).toSeq === Seq(4L, 2L, 1L, 1L))
    assert(r(0).getAs[Double]("mean_lag_us") === 0.0)
    // Stage 3: only u1, 4h from signup to purchase.
    assert(r(3).getAs[Double]("mean_lag_us") === 4.0 * 3600 * 1e6)
    // Stage 1: u1 (1h) and u3 (1h) — mean 1h.
    assert(r(1).getAs[Double]("mean_lag_us") === 3600 * 1e6)
  }

  test("funnel with an unreached tail stage reports zero users, null mean") {
    val e = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Timeseries.funnel(e, Seq("signup", "purchase")).orderBy("stage").collect()
    assert(r.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 0L))
    assert(r(1).isNullAt(r(1).fieldIndex("mean_lag_us")))
  }

  test("groupAuc computes exact Mann-Whitney pair counts, ties, and single-class drops") {
    val df = Seq(
      // g1: perfectly separated — every (pos, neg) pair concordant.
      ("g1", 1.0, false), ("g1", 2.0, false), ("g1", 3.0, true), ("g1", 4.0, true),
      // g2: one pos and one neg at the SAME score — one tied pair, AUC 1/2.
      ("g2", 1.0, true), ("g2", 1.0, false),
      // g3: single class — no pairs, dropped.
      ("g3", 5.0, true))
      .toDF("grp", "s", "y")
    val out = Stats.groupAuc(df, col("grp"), col("s"), col("y")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(!out.contains("g3"))
    val g1 = out("g1")
    assert(g1.getAs[Long]("n_pos") === 2L && g1.getAs[Long]("n_neg") === 2L)
    assert(g1.getAs[Long]("concordant") === 4L)
    assert(g1.getAs[Long]("tied") === 0L)
    assert(g1.getAs[Double]("auc") === 1.0)
    val g2 = out("g2")
    assert(g2.getAs[Long]("concordant") === 0L)
    assert(g2.getAs[Long]("tied") === 1L)
    assert(g2.getAs[Double]("auc") === 0.5)
  }

  test("groupAuc inverted scores give AUC 0 and mixed orders the exact pair fraction") {
    val df = Seq(
      // g: pos at 1, negs at 2 and 3 — zero concordant of 2 pairs.
      ("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, false),
      // h: pos {2, 4}, neg {1, 3}: pairs (2>1), (4>1), (4>3) concordant,
      // (2<3) not — AUC 3/4.
      ("h", 2.0, true), ("h", 4.0, true), ("h", 1.0, false), ("h", 3.0, false))
      .toDF("grp", "s", "y")
    val out = Stats.groupAuc(df, col("grp"), col("s"), col("y")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("g").getAs[Double]("auc") === 0.0)
    assert(out("h").getAs[Long]("concordant") === 3L)
    assert(out("h").getAs[Double]("auc") === 0.75)
  }

  test("calibrationBins: exact ppm rates and centi means per equal-width bin") {
    val df = Seq((0.0, false), (0.1, false), (0.9, true), (1.0, true))
      .toDF("s", "y")
    val out = Stats.calibrationBins(df, col("s"), col("y"), bins = 2)
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    // centi range [0, 100], width formula (2·(s−lo)) div 101.
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(0).getAs[Long]("pos_rate_ppm") === 0L)
    assert(out(0).getAs[Long]("mean_score_centi") === 5L)   // (0+10) div 2
    assert(out(1).getAs[Long]("n_pos") === 2L)
    assert(out(1).getAs[Long]("pos_rate_ppm") === 1000000L)
    assert(out(1).getAs[Long]("mean_score_centi") === 95L)  // (90+100) div 2
  }

  test("calibrationBins: a degenerate single-score range lands in bin 0") {
    val df = Seq((0.5, true), (0.5, false), (0.5, true)).toDF("s", "y")
    val out = Stats.calibrationBins(df, col("s"), col("y")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Int]("bin") === 0)
    assert(out(0).getAs[Long]("pos_rate_ppm") === 666666L) // (2e6) div 3
  }

  test("benfordDigits: integer-string digit path, centi rounding edges, dense spine") {
    // 0.004 rounds to 0 centi -> excluded; 9.996 -> 1000 -> digit 1;
    // 0.2 -> 20 -> digit 2; 95.0 -> 9500 -> digit 9; nulls dropped.
    val df = Seq(Option(0.004), Option(9.996), Option(0.2), Option(95.0),
      Option(123.45), Option.empty[Double]).toDF("x")
    val out = Stats.benfordDigits(df, col("x")).collect()
      .map(r => r.getAs[Long]("digit") -> ((r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"))))
      .toMap
    assert(out.size === 9, "dense 1..9 spine")
    assert(out(1L) === ((2L, 500000L))) // 9.996 and 123.45 (12345 centi)
    assert(out(2L) === ((1L, 250000L)))
    assert(out(9L) === ((1L, 250000L)))
    assert(out(3L) === ((0L, 0L)))
    assert(out.values.map(_._1).sum === 4L)
  }

  test("profileColumns: one row per column, exact nulls/distincts, typed bounds") {
    val df = Seq(
      (1L, Option(2.5), Option("a")),
      (2L, Option.empty[Double], Option("a")),
      (3L, Option(7.5), Option.empty[String]))
      .toDF("id", "x", "s")
    val out = Stats.profileColumns(df).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.size === 3)
    val id = out("id")
    assert(id.getAs[Long]("n_rows") === 3L && id.getAs[Long]("n_null") === 0L)
    assert(id.getAs[Long]("n_distinct") === 3L)
    assert(id.getAs[Double]("min_num") === 1.0 && id.getAs[Double]("max_num") === 3.0)
    val x = out("x")
    assert(x.getAs[Long]("n_null") === 1L && x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_num") === 2.5 && x.getAs[Double]("max_num") === 7.5)
    val s = out("s")
    assert(s.getAs[Long]("n_null") === 1L && s.getAs[Long]("n_distinct") === 1L)
    assert(s.isNullAt(s.fieldIndex("min_num")) && s.isNullAt(s.fieldIndex("max_num")))
  }

  test("clusterPurity: majority cells, smaller-label tie-break, exact ppm, unlabeled ignored") {
    val assign = Seq((1L, "c1"), (2L, "c1"), (3L, "c1"), (4L, "c2"), (5L, "c2"),
      (6L, "c3"), (99L, "c4")) // id 99 has no label row -> c4 absent
      .toDF("id", "cluster")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 3L), (5L, 2L), (6L, 9L))
      .toDF("id", "label")
    val out = Stats.clusterPurity(assign, labels).collect()
      .map(r => r.getAs[String]("cluster") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("top_label"),
          r.getAs[Long]("n_top"), r.getAs[Long]("purity_ppm")))).toMap
    assert(out("c1") === ((3L, 0L, 2L, 666666L)))
    assert(out("c2") === ((2L, 2L, 1L, 500000L)), "count tie breaks on the smaller label")
    assert(out("c3") === ((1L, 9L, 1L, 1000000L)))
    assert(!out.contains("c4"))
  }

  test("rocCurve: exact confusion prefixes per threshold, single-class drop, (1,1) endpoint") {
    val df = Seq(
      // g: pos {0.30, 0.20}, neg {0.20, 0.10} — thresholds 30, 20, 10.
      ("g", 0.30, true), ("g", 0.20, true), ("g", 0.20, false), ("g", 0.10, false),
      // h: single class — no curve.
      ("h", 0.50, true))
      .toDF("grp", "s", "y")
    val out = Stats.rocCurve(df, col("grp"), col("s"), col("y")).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("thr_centi")) -> r).toMap
    assert(!out.keys.exists(_._1 == "h"))
    assert(out.size === 3)
    val t30 = out(("g", 30L))
    assert(t30.getAs[Long]("tp") === 1L && t30.getAs[Long]("fp") === 0L)
    assert(t30.getAs[Long]("tpr_ppm") === 500000L)
    assert(t30.getAs[Long]("fpr_ppm") === 0L)
    assert(t30.getAs[Long]("precision_ppm") === 1000000L)
    val t20 = out(("g", 20L))
    assert(t20.getAs[Long]("tp") === 2L && t20.getAs[Long]("fp") === 1L)
    assert(t20.getAs[Long]("tpr_ppm") === 1000000L)
    assert(t20.getAs[Long]("fpr_ppm") === 500000L)
    assert(t20.getAs[Long]("precision_ppm") === 666666L)
    // The lowest observed threshold always classifies everything positive.
    val t10 = out(("g", 10L))
    assert(t10.getAs[Long]("tpr_ppm") === 1000000L && t10.getAs[Long]("fpr_ppm") === 1000000L)
    assert(t10.getAs[Long]("n_pos") === 2L && t10.getAs[Long]("n_neg") === 2L)
  }

  test("scd2Intervals collapses runs, chains validity, ties on event_id") {
    def us(s: String): Long = ts(s).getTime * 1000L
    val ev = Seq(
      // User 10: A, A (run-collapsed), B, A — three versions.
      (1L, ts("2024-01-01 10:00:00"), 10L, "A", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 10L, "A", 1.0, "{}"),
      (3L, ts("2024-01-02 09:00:00"), 10L, "B", 1.0, "{}"),
      (4L, ts("2024-01-03 08:00:00"), 10L, "A", 1.0, "{}"),
      // User 11: two events at the SAME timestamp — event_id breaks the tie.
      (6L, ts("2024-01-01 10:00:00"), 11L, "Y", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 11L, "X", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Timeseries.scd2Intervals(ev).orderBy("user_id", "version").collect()
    assert(out.length === 5)
    val u10 = out.filter(_.getAs[Long]("user_id") === 10L)
    assert(u10.map(_.getAs[String]("attr")).toSeq === Seq("A", "B", "A"))
    assert(u10.map(_.getAs[Int]("version")).toSeq === Seq(1, 2, 3))
    // The duplicate A collapses: version 1 opens at the FIRST A and stays
    // valid until B arrives.
    assert(u10(0).getAs[Long]("valid_from_us") === us("2024-01-01 10:00:00"))
    assert(u10(0).getAs[Long]("valid_to_us") === us("2024-01-02 09:00:00"))
    assert(u10(1).getAs[Long]("valid_to_us") === us("2024-01-03 08:00:00"))
    assert(u10(2).getAs[Long]("valid_to_us") === -1L)
    assert(u10.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, false, true))
    // Same-timestamp tie: event_id 5 (X) precedes 6 (Y).
    val u11 = out.filter(_.getAs[Long]("user_id") === 11L)
    assert(u11.map(_.getAs[String]("attr")).toSeq === Seq("X", "Y"))
    assert(u11(0).getAs[Long]("valid_to_us") === us("2024-01-01 10:00:00"))
    assert(u11(1).getAs[Boolean]("is_current"))
  }

  test("cusum closed form equals the direct recurrence; sustained shift alarms, z-score would not") {
    import org.apache.spark.sql.functions.{col, lit}
    // 20 days of baseline-10 counts, then 10 days at 14 (+~1.3 sigma of the
    // overall series - below any 2-sigma pointwise gate) for type "a".
    val counts = (0 until 20).map(_ => 10) ++ (0 until 10).map(_ => 14)
    val rows = counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map { j =>
        ((day * 1000 + j).toLong,
          ts(f"2024-01-${day + 1}%02d 10:00:00"), j.toLong, "a", 1.0, "{}")
      }
    }
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Timeseries.cusum(e)
      .orderBy("epoch_day").collect()
    assert(r.length === 30)
    val mu = counts.map(_.toLong).sum / 30  // floor mean = 11
    val slack = mu / 20
    val h = mu / 4
    // Direct recurrence replay.
    var sp = 0L; var sn = 0L
    val expected = counts.map { n =>
      sp = math.max(0L, sp + (n - mu - slack))
      sn = math.max(0L, sn - (n - mu + slack))
      (sp, sn)
    }
    assert(r.map(x => (x.getAs[Long]("s_pos"), x.getAs[Long]("s_neg"))).toSeq
      === expected)
    // The shift alarms within a few days of day 20...
    val alarms = r.map(_.getAs[Boolean]("alarm_up")).toSeq
    assert(alarms.drop(20).count(identity) >= 5, s"no sustained alarm: $alarms")
    assert(!alarms.take(18).exists(identity), "baseline must not alarm")
    // ...while the pointwise z-score monitor at 2 sigma stays silent on
    // every single shifted day (the gap CUSUM exists to close).
    val z = graft.operators.Timeseries.dailyAnomalies(e)
      .collect().map(_.getAs[Boolean]("is_anomaly"))
    assert(!z.exists(identity), "pointwise z-score should miss a +1.3 sigma shift")
  }

  test("classifierEval: exact confusion counts and ppm metrics by hand") {
    // tp=2, fp=1, fn=1, tn=2 over six rows (plus a null-pred row dropped).
    val df = Seq(
      (Some(true), true), (Some(true), true), (Some(true), false),
      (Some(false), true), (Some(false), false), (Some(false), false),
      (None, true))
      .toDF("p", "y")
    val r = Stats.classifierEval(df, col("p"), col("y")).collect().head
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fp") === 1L)
    assert(r.getAs[Long]("fn") === 1L && r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("accuracy_ppm") === 666666L)  // 4e6 div 6
    assert(r.getAs[Long]("precision_ppm") === 666666L) // 2e6 div 3
    assert(r.getAs[Long]("recall_ppm") === 666666L)
    // f1 = (2*666666*666666) div (1333332) = 666666
    assert(r.getAs[Long]("f1_ppm") === 666666L)
  }

  test("classifierEval: undefined precision/recall surface as NULL, not zero") {
    val noPos = Seq((false, true), (false, false)).toDF("p", "y")
    val r1 = Stats.classifierEval(noPos, col("p"), col("y")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("precision_ppm")), "no predicted positives")
    assert(r1.getAs[Long]("recall_ppm") === 0L)
    assert(r1.isNullAt(r1.fieldIndex("f1_ppm")))
    val noTrue = Seq((true, false), (false, false)).toDF("p", "y")
    val r2 = Stats.classifierEval(noTrue, col("p"), col("y")).collect().head
    assert(r2.getAs[Long]("precision_ppm") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("recall_ppm")), "no actual positives")
  }

  test("ndcgAtK: whole-bit discounts, ideal reordering, all-zero grades -> NULL") {
    // Query 1: ranked grades (3, 0, 2) at ranks 1..3. Discounts d(1)=d(2)=1,
    // d(3)=2. dcg = 3e6/1 + 0 + 2e6/2 = 4e6. Ideal order (3, 2, 0):
    // idcg = 3e6/1 + 2e6/1 + 0 = 5e6. ndcg = 800000 ppm.
    // Query 2: all grades zero -> idcg 0 -> NULL.
    // Query 3: already ideal -> ndcg exactly 1e6.
    val runs = Seq(
      (1L, 1L, 3L), (1L, 2L, 0L), (1L, 3L, 2L),
      (2L, 1L, 0L), (2L, 2L, 0L),
      (3L, 1L, 2L), (3L, 2L, 1L))
      .toDF("query_id", "rnk", "rel")
    val out = Stats.ndcgAtK(runs, 10).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Long]("dcg_m") === 4000000L)
    assert(out(1L).getAs[Long]("idcg_m") === 5000000L)
    assert(out(1L).getAs[Long]("ndcg_ppm") === 800000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("ndcg_ppm")))
    assert(out(3L).getAs[Long]("ndcg_ppm") === 1000000L)
    // Rows past k are ignored: k=1 keeps only rank 1.
    val top1 = Stats.ndcgAtK(runs, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("dcg_m")).toMap
    assert(top1(1L) === 3000000L)
  }

  test("averagePrecision: per-hit floored precisions, zero-hit queries NULL") {
    // Query 1: rel at ranks 1, 3, 4 of 5. Contributions:
    //   r1: ⌊1e6·1/1⌋ = 1000000; r3: ⌊1e6·2/3⌋ = 666666; r4: ⌊1e6·3/4⌋ = 750000.
    //   ap = ⌊2416666/3⌋ = 805555.
    // Query 2: no hits -> NULL. Query 3: single hit at rank 2 -> ⌊1e6/2⌋.
    val runs = Seq(
      (1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 0L),
      (2L, 1L, 0L), (2L, 2L, 0L),
      (3L, 1L, 0L), (3L, 2L, 1L))
      .toDF("query_id", "rnk", "rel")
    val out = Stats.averagePrecision(runs, 10).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Long]("hits") === 3L)
    assert(out(1L).getAs[Long]("ap_ppm") === 805555L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("ap_ppm")))
    assert(out(3L).getAs[Long]("ap_ppm") === 500000L)
    // k cuts the run BEFORE scoring: with k=3 query 1 keeps hits at 1 and 3.
    val cut = Stats.averagePrecision(runs, 3).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(cut(1L).getAs[Long]("hits") === 2L)
    assert(cut(1L).getAs[Long]("ap_ppm") === (1000000L + 666666L) / 2)
  }

  test("cohenKappa: exact marginal chance correction, by hand") {
    // Contingency (a\b): yes/yes 20, yes/no 5, no/yes 10, no/no 15. n=50.
    // agree = 35 -> po_ppm = 700000. Marginals: a-yes 25, a-no 25; b-yes 30,
    // b-no 20. pe_num = 25·30 + 25·20 = 1250. pe_ppm = ⌊1e6·1250/2500⌋ =
    // 500000. kappa = (50·35 − 1250)/(2500 − 1250) = 500/1250 -> 400000 ppm.
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Stats.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    assert(out.getAs[Long]("n") === 50L)
    assert(out.getAs[Long]("agree") === 35L)
    assert(out.getAs[Long]("po_ppm") === 700000L)
    assert(out.getAs[Long]("pe_ppm") === 500000L)
    assert(out.getAs[Long]("kappa_ppm") === 400000L)
  }

  test("cohenKappa: systematic disagreement goes negative; constant raters NULL") {
    // Raters always flip: diag 0, po 0. Marginals 10/10 each side ->
    // pe_num = 2·(10·10) = 200, n² = 400. kappa = (0 − 200)/(400 − 200) =
    // −1/1 -> −1000000 ppm exactly (perfect systematic disagreement on a
    // balanced binary table). Truncation sign-splits: both engines agree.
    val flip = (Seq.fill(10)(("y", "n")) ++ Seq.fill(10)(("n", "y"))).toDF("a", "b")
    val neg = Stats.cohenKappa(flip, col("a"), col("b")).collect()(0)
    assert(neg.getAs[Long]("kappa_ppm") === -1000000L)
    // Both raters constant and equal: pe = 1 -> NULL kappa, po = 1e6.
    val const = Seq.fill(7)(("y", "y")).toDF("a", "b")
    val k = Stats.cohenKappa(const, col("a"), col("b")).collect()(0)
    assert(k.getAs[Long]("po_ppm") === 1000000L)
    assert(k.isNullAt(k.fieldIndex("kappa_ppm")))
  }

  test("giniCoefficient: closed-form anchors, partitioning invariance, all-zero NULL") {
    // eq: all equal -> 0. max: one holder of everything -> (n-1)/n = 0.75.
    // lin: 1,2,3,4 -> [2·30 − 5·10]/[4·10] = 0.25. z: all zero -> NULL.
    val rows = Seq("eq" -> 5L, "eq" -> 5L, "eq" -> 5L, "eq" -> 5L) ++
      Seq("mx" -> 0L, "mx" -> 0L, "mx" -> 0L, "mx" -> 10L) ++
      Seq("ln" -> 1L, "ln" -> 2L, "ln" -> 3L, "ln" -> 4L) ++
      Seq("z" -> 0L, "z" -> 0L)
    val df = rows.toDF("g", "x")
    val out = Stats.giniCoefficient(df, col("g"), col("x")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("eq").getAs[Double]("gini") === 0.0)
    assert(out("mx").getAs[Double]("gini") === 0.75)
    assert(out("ln").getAs[Double]("gini") === 0.25)
    assert(out("ln").getAs[Long]("sum_x") === 10L)
    assert(out("z").isNullAt(out("z").fieldIndex("gini")))
    // The distributed rank must not depend on the partition count.
    val one = Stats.giniCoefficient(df, col("g"), col("x"), numPartitions = 1)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Any]("gini")).toMap
    val seven = Stats.giniCoefficient(df, col("g"), col("x"), numPartitions = 7)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Any]("gini")).toMap
    assert(one === seven)
  }

  test("groupLinearRegression: exact closed-form OLS; degenerate variances go NULL") {
    // g1: y = 1 + 2x exactly -> slope 2, intercept 1, r2 = 1.
    // g2: noisy line y = (0,2,1,3) on x = 0..3 -> slope 0.8 exactly
    //   (cov_num = 4*14-6*6 = 20... by hand: sxy=0+2+2+9=13? recompute
    //   in-test instead of in-comment).
    // g3: single distinct x -> NULL slope; g4: constant y -> slope 0, NULL r2.
    val rows = Seq(
      ("g1", 0L, 1L), ("g1", 1L, 3L), ("g1", 2L, 5L), ("g1", 3L, 7L),
      ("g2", 0L, 0L), ("g2", 1L, 2L), ("g2", 2L, 1L), ("g2", 3L, 3L),
      ("g3", 5L, 1L), ("g3", 5L, 9L),
      ("g4", 0L, 4L), ("g4", 1L, 4L), ("g4", 2L, 4L))
    val out = Stats.groupLinearRegression(
        rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("g1").getAs[Double]("slope") === 2.0)
    assert(out("g1").getAs[Double]("intercept") === 1.0)
    // r2 rides two sqrts: a perfect line lands within one ulp-cluster of 1.
    assert(math.abs(out("g1").getAs[Double]("r2") - 1.0) < 1e-12)
    // g2 closed form: n=4, sx=6, sy=6, sxx=14, sxy=0+2+2+9=13.
    // cov = 4·13−36 = 16; varx = 4·14−36 = 20 -> slope 0.8;
    // intercept = (6 − 0.8·6)/4 = 0.3; vary = 4·14−36 = 20 -> r2 = 16²/400 = 0.64.
    assert(out("g2").getAs[Double]("slope") === 0.8)
    assert(math.abs(out("g2").getAs[Double]("intercept") - 0.3) < 1e-12)
    assert(math.abs(out("g2").getAs[Double]("r2") - 0.64) < 1e-12)
    assert(out("g3").isNullAt(out("g3").fieldIndex("slope")))
    assert(out("g3").isNullAt(out("g3").fieldIndex("r2")))
    assert(out("g4").getAs[Double]("slope") === 0.0)
    assert(out("g4").isNullAt(out("g4").fieldIndex("r2")))
  }

  test("seasonalResiduals: the weekly zero-day is a pattern, the one-off spike an anomaly") {
    // 29 days from Monday 2024-01-01 (both endpoints observed — gapFill
    // spans observed days only): Sundays always 0 events, weekdays base
    // 3/4 with a +1 jitter on odd weeks, one 50-event spike on day 17
    // (a Thursday). A global z-score would flag every Sunday; the
    // per-dow median baseline absorbs them, leaving exactly the spike.
    val start = java.time.LocalDate.of(2024, 1, 1)
    var id = 0L
    val rows = for {
      d <- 0 until 29
      base = Seq(0, 3, 4, 3, 4, 3, 4)((d + 1) % 7) // real dow, Sunday = 0
      cnt = if (d == 17) 50 else if (base == 0) 0 else base + (d / 7) % 2
      _ <- 0 until cnt
    } yield { id += 1; (id, ts(s"${start.plusDays(d.toLong)} 10:00:00"), 1L, "a", 1.0, "{}") }
    val out = Timeseries.seasonalResiduals(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getAs[Long]("epoch_day") -> r).toMap
    assert(out.size === 29)
    val d0 = out.keys.min
    // dow mapping: 2024-01-01 is a Monday -> 1.
    assert(out(d0).getAs[Long]("dow") === 1L)
    // Sundays (d = 6, 13, 20, 27): baseline 0, residual 0, never anomalous.
    for (w <- 0 until 4) {
      val sunday = out(d0 + 6L + 7L * w)
      assert(sunday.getAs[Long]("dow") === 0L)
      assert(sunday.getAs[Double]("baseline") === 0.0)
      assert(sunday.getAs[Double]("residual") === 0.0)
      assert(!sunday.getAs[Boolean]("is_anomaly"))
    }
    // The spike day is the ONE anomaly: Thursday counts (4, 5, 50, 5)
    // -> baseline 5, residual 45.
    val flagged = out.values.filter(_.getAs[Boolean]("is_anomaly")).toSeq
    assert(flagged.map(_.getAs[Long]("epoch_day")) === Seq(d0 + 17L))
    assert(flagged.head.getAs[Double]("baseline") === 5.0)
    assert(flagged.head.getAs[Double]("residual") === 45.0)
  }

  test("robustOutliers: MAD flags what the inflated stddev masks; zero-MAD yields NULL z") {
    // Group a: 1..8 plus outliers 1000, 1001. med = 5.5, MAD = 2.5,
    // cutoff = 3·1.4826·2.5 = 11.1195 — both outliers flagged. The
    // CLASSIC z-score is masked: stddev ≈ 398 -> z(1001) ≈ 2.0 < 3.
    val xs = (1 to 8).map(_.toDouble) ++ Seq(1000.0, 1001.0)
    val mean = xs.sum / xs.length
    val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
    assert((1001.0 - mean) / std < 3.0, "fixture must demonstrate classic-z masking")
    // Group b: constant except one spike -> MAD 0 -> NULL z, no flags.
    val rows = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) } ++
      (0 until 9).map(i => ("b", i.toLong, 7.0)) :+ ("b", 9L, 100.0)
    val out = Stats.robustOutliers(
        rows.toDF("g", "i", "x"), col("g"), col("i"), col("x"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")) -> r).toMap
    assert(out(("a", 0L)).getAs[Double]("med") === 5.5)
    assert(out(("a", 0L)).getAs[Double]("mad") === 2.5)
    assert(out(("a", 8L)).getAs[Boolean]("is_outlier"))
    assert(out(("a", 9L)).getAs[Boolean]("is_outlier"))
    assert((0 to 7).forall(i => !out(("a", i.toLong)).getAs[Boolean]("is_outlier")))
    assert(out(("a", 9L)).getAs[Double]("robust_z") > 100.0)
    // Zero MAD: no finite threshold — NULL z, FALSE flag even for the spike.
    val spike = out(("b", 9L))
    assert(spike.getAs[Double]("mad") === 0.0)
    assert(spike.isNullAt(spike.fieldIndex("robust_z")))
    assert(!spike.getAs[Boolean]("is_outlier"))
  }

  test("kendallTau: exact concordant/discordant pairs, reversal -1, identity +1") {
    // Query 1: ranks a = (1,2,3), b = (1,3,2) over items x,y,z.
    //   Pairs: (x,y) conc, (x,z) conc, (y,z) disc -> tau = (2−1)/3 -> 333333.
    // Query 2: b reverses a -> all 3 pairs discordant -> −1000000.
    // Query 3: identical order -> +1000000. Query 4: single item -> NULL.
    val ranks = Seq(
      (1L, "x", 1, 1), (1L, "y", 2, 3), (1L, "z", 3, 2),
      (2L, "x", 1, 3), (2L, "y", 2, 2), (2L, "z", 3, 1),
      (3L, "x", 1, 1), (3L, "y", 2, 2), (3L, "z", 3, 3),
      (4L, "x", 1, 1))
      .toDF("query_id", "item_id", "rank_a", "rank_b")
    val out = Stats.kendallTau(ranks).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Long]("concordant") === 2L)
    assert(out(1L).getAs[Long]("discordant") === 1L)
    assert(out(1L).getAs[Long]("tau_ppm") === 333333L)
    assert(out(2L).getAs[Long]("tau_ppm") === -1000000L)
    assert(out(3L).getAs[Long]("tau_ppm") === 1000000L)
    assert(out(4L).getAs[Long]("n_items") === 1L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("tau_ppm")))
  }

  test("lagCorrelation: exact Pearson pieces; a shifted 2x series is r²=1 at lag 1") {
    // Clicks per day (d0..d2): 2, 1, 3. Purchases (d1..d3): 4, 2, 6 = 2x
    // shifted by one day -> lag 1 perfectly positive (r² = 1e6 ppm).
    // Lag 0 overlap {d1,d2}: x=(1,3), y=(4,2) -> perfectly NEGATIVE.
    val days = Seq("01", "02", "03", "04")
    var id = 0L
    val rows = Seq((0, 2), (1, 1), (2, 3)).flatMap { case (d, c) =>
      (1 to c).map { _ => id += 1
        (id, ts(s"2024-01-${days(d)} 10:00:00"), 1L, "click", 1.0, "{}") }
    } ++ Seq((1, 4), (2, 2), (3, 6)).flatMap { case (d, c) =>
      (1 to c).map { _ => id += 1
        (id, ts(s"2024-01-${days(d)} 11:00:00"), 1L, "purchase", 1.0, "{}") }
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Timeseries.lagCorrelation(ev, maxLag = 2).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out(1L).getAs[Long]("n_days") === 3L)
    assert(out(1L).getAs[Long]("sxy") === 28L)
    assert(out(1L).getAs[Long]("corr_sign") === 1L)
    assert(out(1L).getAs[Long]("r2_ppm") === 1000000L)
    assert(out(0L).getAs[Long]("corr_sign") === -1L)
    assert(out(0L).getAs[Long]("r2_ppm") === 1000000L)
  }

  test("reciprocalRank: first-hit rank in exact ppm, zero when the run has no hit") {
    // q1: first hit at rank 3 -> 333333; q2: hit at 1 -> 1000000;
    // q3: no hits -> NULL first rank, rr 0; rank 11 is beyond k and ignored.
    val runs = Seq(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 1L, 1L),
      (3L, 1L, 0L), (3L, 2L, 0L), (3L, 11L, 1L))
      .toDF("query_id", "rnk", "rel")
    val out = Stats.reciprocalRank(runs, 10).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).getAs[Long]("first_rel_rank") === 3L)
    assert(out(1L).getAs[Long]("rr_ppm") === 333333L)
    assert(out(2L).getAs[Long]("rr_ppm") === 1000000L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("first_rel_rank")))
    assert(out(3L).getAs[Long]("rr_ppm") === 0L)
  }

  test("rankSumTest: hand-computed doubled U, delta, CLES, and tie-corrected z²") {
    // Pool: A={1,2}, B={2,3,3}. Midranks 1, 2.5, 2.5, 4.5, 4.5.
    //   A: R=3.5 -> r_x2=7, U·2=1 (one tie pair), delta=-5, CLES=1/12.
    //   T=12, z² = 25·(3/(2.7·4)) ... = 2.314814 -> micro 2314814.
    val df = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L), ("B", 3L))
      .toDF("g", "v")
    val out = Stats.rankSumTest(df, col("g"), col("v")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n1") === 2L && a.getAs[Long]("n2") === 3L)
    assert(a.getAs[Long]("u_x2") === 1L)
    assert(a.getAs[Long]("delta") === -5L)
    assert(a.getAs[Long]("cles_ppm") === 83333L)
    assert(a.getAs[Long]("z2_micro") === 2314814L)
    // Each-vs-rest symmetry for two groups: deltas negate, z² agrees.
    val b = out("B")
    assert(b.getAs[Long]("u_x2") === 11L)
    assert(b.getAs[Long]("delta") === 5L)
    assert(b.getAs[Long]("z2_micro") === 2314814L)
  }

  test("rankSumTest: an all-tied pool gives CLES exactly half and NULL z²") {
    val df = Seq(("A", 7L), ("A", 7L), ("B", 7L)).toDF("g", "v")
    val out = Stats.rankSumTest(df, col("g"), col("v")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("A").getAs[Long]("cles_ppm") === 500000L)
    assert(out("A").isNullAt(out("A").fieldIndex("z2_micro")))
    assert(out("B").getAs[Long]("cles_ppm") === 500000L)
  }

  test("quantileNormalize: group ranks map onto exact global order statistics") {
    // Global sorted x: 5,10,15,20,30,40 (N=6). Group a (n=4) maps ranks
    // 1..4 → global ranks ceil(r·6/4) = 2,3,5,6 → values 10,15,30,40;
    // group b (n=2) maps ranks 1,2 → global ranks 3,6 → values 15,40.
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 5L), (6L, "b", 15L))
      .toDF("id", "g", "x")
    val out = Stats.quantileNormalize(df, col("g"), col("id"), col("x"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("src_rank"), r.getAs[Long]("g_rank"), r.getAs[Long]("x_norm"))).toMap
    assert(out(1L) === ((1L, 2L, 10L)))
    assert(out(2L) === ((2L, 3L, 15L)))
    assert(out(3L) === ((3L, 5L, 30L)))
    assert(out(4L) === ((4L, 6L, 40L)))
    assert(out(5L) === ((1L, 3L, 15L)))
    assert(out(6L) === ((2L, 6L, 40L)))
    // The top of every group maps to the global maximum by construction.
  }

  test("rollingActiveUsers: sweep-line equals the naive day-grid count-distinct") {
    // User 10 active days 0 and 9 (two disjoint W=3 intervals), user 11
    // active days 1,2,3 (one merged interval), user 12 active day 5 only.
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 10L, "a", 1.0, "{}"),
      (2L, ts("2024-01-10 08:00:00"), 10L, "a", 1.0, "{}"),
      (3L, ts("2024-01-02 08:00:00"), 11L, "a", 1.0, "{}"),
      (4L, ts("2024-01-03 08:00:00"), 11L, "a", 1.0, "{}"),
      (5L, ts("2024-01-04 08:00:00"), 11L, "a", 1.0, "{}"),
      (6L, ts("2024-01-06 08:00:00"), 12L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w = 3
    val got = Timeseries.rollingActiveUsers(ev, windowDays = w)
      .orderBy("day").collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_active"))
    val d0 = got.map(_._1).min
    // Observed range is days 0..9 — one row per day, no gaps.
    assert(got.map(_._1).toSeq === (d0 to d0 + 9).toSeq)
    val active = Map(10L -> Set(0L, 9L), 11L -> Set(1L, 2L, 3L), 12L -> Set(5L))
    val naive = (0L to 9L).map { d =>
      active.count { case (_, ds) => ds.exists(a => a <= d && d <= a + w - 1) }.toLong
    }
    assert(got.map(_._2).toSeq === naive)
    // Spot the interesting cells by hand: day 2 has user 10's carryover
    // (interval [0,2]) plus user 11; day 3 is user 11 alone (10's
    // interval closed); day 8 is the dead gap before 10 returns on 9.
    val byDay = got.toMap
    assert(byDay(d0 + 2) === 2L)
    assert(byDay(d0 + 3) === 1L)
    assert(byDay(d0 + 8) === 0L)
    assert(byDay(d0 + 9) === 1L)
  }
}

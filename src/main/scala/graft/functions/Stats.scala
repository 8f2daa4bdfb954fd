package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Distributed statistical profiling with oracle-exact arithmetic.
  *
  * Spark's own `avg`/`var_pop`/`stddev` fold doubles in partition order,
  * so their results drift run-to-run and engine-to-engine. Both operators
  * here keep every aggregate in exact integer space (map-side-combinable
  * sums — one shuffle, counter-sized state) and derive each double output
  * with single correctly-rounded IEEE ops on those exact integers, which
  * makes the values bit-identical regardless of partitioning, fold order,
  * or engine — the property the DuckDB oracle gate checks.
  */
object Stats {

  /** Per-group count / mean / population variance / stddev of an integer
    * measure, from the exact sufficient statistics (n, Σx, Σx²):
    * `mean = Σx / n`, `var = (n·Σx² − (Σx)²) / n²` — numerator and
    * denominator are exact integers, so each is ONE division; `stddev`
    * is one `sqrt` of that. All sums and products are carried as
    * `DECIMAL(38,0)` (exact 128-bit integer space — the same width the
    * DuckDB oracle's HUGEINT uses), so the variance numerator cannot
    * wrap a long: the operator is exact while `n·Σx² < 10³⁸` (e.g. 10¹²
    * rows of |x| ≤ 10¹²), and past that Spark yields NULL rather than a
    * silently wrong value.
    */
  def exactMoments(df: DataFrame, group: Column, x: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 0)
    df.select(group.as("grp"), x.cast("long").cast(dec).as("x"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .select(
        col("grp"),
        col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        ((col("n").cast(dec) * col("ss") - col("s") * col("s")).cast("double") /
          (col("n").cast(dec) * col("n")).cast("double")).as("variance"))
      .withColumn("stddev", sqrt(col("variance")))
  }

  /** Per-group exact Pearson correlation and population covariance of two
    * integer measures, from the joint sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy) — all carried as `DECIMAL(38,0)`, one
    * map-side-combined aggregate, counter-sized state. The derivations
    * are single IEEE ops on exact integers:
    * `cov = (n·Σxy − Σx·Σy) / n²` (one division) and
    * `corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))`
    * (two sqrts, one multiply, one division, all on exactly-computed
    * numerators) — bit-identical across engines and partitionings, which
    * Spark's own `corr` (an order-dependent double fold) is not. `corr`
    * is scale-invariant, so callers may pre-scale decimal measures to
    * integers (e.g. price cents) without changing it; `cov_pop` is in
    * the scaled units. Zero variance on either side yields NULL corr.
    */
  def exactCorrelation(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 0)
    val agg = df
      .select(
        group.as("grp"),
        x.cast("long").cast(dec).as("x"),
        y.cast("long").cast(dec).as("y"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nDec = col("n").cast(dec)
    val covNum = nDec * col("sxy") - col("sx") * col("sy")
    val varXNum = nDec * col("sxx") - col("sx") * col("sx")
    val varYNum = nDec * col("syy") - col("sy") * col("sy")
    agg.select(
      col("grp"),
      col("n"),
      (covNum.cast("double") / (nDec * col("n")).cast("double")).as("cov_pop"),
      when(varXNum === 0 || varYNum === 0, lit(null).cast("double"))
        .otherwise(
          covNum.cast("double") /
            (sqrt(varXNum.cast("double")) * sqrt(varYNum.cast("double"))))
        .as("corr"))
  }

  /** Per-group simple linear regression (OLS y = a + b·x) from the exact
    * joint sufficient statistics — the TREND operator completing
    * [[exactMoments]] (location/spread) and [[exactCorrelation]]
    * (association): is ingest volume growing, is quality drifting DOWN
    * over time, at what exact rate? All sums are DECIMAL(38,0)
    * (HUGEINT-width, wrap-proof), and each output is a fixed IEEE tree
    * over those exact integers:
    * {{{
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)     (one division)
    *   intercept = (Σy − slope·Σx) / n
    *   r²        = r·r with r from exactCorrelation's closed form
    * }}}
    * Zero x-variance (a single distinct x) yields NULL slope/intercept/
    * r²; zero y-variance yields slope 0 with NULL r² — surfaced the
    * same way in both engines.
    *
    * Scale: one map-side-combined aggregate, counter-sized state per
    * group — nothing past the partial aggregates is row-sized.
    */
  def groupLinearRegression(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 0)
    val agg = df
      .select(
        group.as("grp"),
        x.cast("long").cast(dec).as("x"),
        y.cast("long").cast(dec).as("y"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nDec = col("n").cast(dec)
    val covNum = nDec * col("sxy") - col("sx") * col("sy")
    val varXNum = nDec * col("sxx") - col("sx") * col("sx")
    val varYNum = nDec * col("syy") - col("sy") * col("sy")
    agg
      .withColumn(
        "slope",
        when(varXNum > lit(0).cast(dec), covNum.cast("double") / varXNum.cast("double")))
      .withColumn(
        "intercept",
        when(
          col("slope").isNotNull,
          (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
            col("n").cast("double")))
      .withColumn(
        "r2",
        when(varXNum > lit(0).cast(dec) && varYNum > lit(0).cast(dec), {
          val r = covNum.cast("double") /
            (sqrt(varXNum.cast("double")) * sqrt(varYNum.cast("double")))
          r * r
        }))
      .select(col("grp"), col("n"), col("slope"), col("intercept"), col("r2"))
  }

  /** Per-group Gini coefficient — the inequality summary ("is 1% of the
    * domains contributing 90% of the tokens?") a mixing recipe checks
    * before trusting per-source averages. Over nonnegative measures
    * `x_(1) ≤ … ≤ x_(n)` the closed form is one exact rational:
    * `G = [2·Σ i·x_(i) − (n+1)·Σx] / (n·Σx)` — numerator and
    * denominator are exact DECIMAL(38,0) integers (Σ i·x is invariant
    * under tie orderings, so the rank's tie-break never matters), and
    * the output is ONE IEEE division. All-zero groups yield NULL.
    *
    * Scale: the global per-group sort is the textbook anti-pattern, so
    * ranks come from a distributed prefix-count over EXPLICIT value
    * buckets: one bounded approx_percentile pass collects ≤
    * `numPartitions − 1` boundary values (a driver literal — boundary
    * QUALITY only balances partitions, never correctness), `_pid`
    * becomes a pure row function (count of boundaries ≤ x), and the
    * per-(grp, bucket) COUNT table turns into offsets with a window
    * that never touches the data. Deliberately NOT the
    * `spark_partition_id()`-after-repartitionByRange idiom: that makes
    * rank consistency depend on both subtrees reusing ONE sampled
    * exchange, and a resampled second exchange silently corrupts every
    * rank.
    */
  def giniCoefficient(
      df: DataFrame,
      group: Column,
      x: Column,
      numPartitions: Int = 32): DataFrame = {
    require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")
    val dec = DataTypes.createDecimalType(38, 0)
    val v = df.select(group.as("grp"), x.cast("long").as("x"))
    val qs = (1 until numPartitions).map(i => i.toDouble / numPartitions)
    val bounds: Seq[Long] =
      if (qs.isEmpty) Seq.empty
      else v.agg(expr(s"approx_percentile(x, array(${qs.mkString(", ")}), 10000)"))
        .collect()(0).getSeq[Long](0)
    val pid =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds), b => col("x") >= b))
    val t = v.withColumn("_pid", pid)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("_pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("grp"), col("_pid")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col("grp"), col("_pid"), col("_off"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"), col("_pid")).orderBy(col("x"))
    t.join(broadcast(offsets), Seq("grp", "_pid"))
      .withColumn("rnk", col("_off") + row_number().over(wRank))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("s"),
        sum(col("rnk").cast(dec) * col("x").cast(dec)).as("a"))
      .select(
        col("grp"), col("n"),
        col("s").cast("long").as("sum_x"),
        when(
          col("s") > lit(0).cast(dec),
          (lit(2).cast(dec) * col("a") -
            (col("n") + 1L).cast(dec) * col("s")).cast("double") /
            (col("n").cast(dec) * col("s")).cast("double")).as("gini"))
  }

  /** Cross-group quantile normalization — map every group's score
    * distribution onto the GLOBAL one, the calibration pass that makes
    * per-source quality scores comparable before a single threshold or
    * mixing ratio is applied across sources (source A's "0.8" and source
    * B's "0.8" rarely mean the same thing). Each row's within-group rank
    * `r` (of `n_s`, ordered by `(x, id)` — deterministic under ties) maps
    * to the global order statistic at rank `ceil(r·N/n_s)`; the output
    * value is exactly that global value, so every group's normalized
    * distribution is a subsample of the global one. All-integer: ranks,
    * the ceiling (`(r·N + n_s − 1) div n_s` on nonnegative operands —
    * trunc and floor agree), and the mapped value itself. BIGINT
    * headroom: `r·N ≤ N²`, exact while `N ≤ 3·10⁹` rows.
    *
    * Scale: the global order statistic table deliberately avoids the
    * single-partition `row_number` — [[giniCoefficient]]'s distributed
    * prefix-count: bounded `approx_percentile` boundaries (a driver
    * literal; boundary quality only balances partitions, never
    * correctness), per-bucket counts to offsets via a window over ≤
    * `numPartitions` rows, `row_number` only WITHIN a bucket. The
    * within-group rank is one group-partitioned window exchange, and the
    * rank→value mapping is a shuffle equi-join on the computed target
    * rank.
    */
  def quantileNormalize(
      df: DataFrame,
      group: Column,
      id: Column,
      x: Column,
      numPartitions: Int = 32): DataFrame = {
    require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")
    val v = df.select(group.as("grp"), id.as("id"), x.cast("long").as("x"))
    val qs = (1 until numPartitions).map(i => i.toDouble / numPartitions)
    val bounds: Seq[Long] =
      if (qs.isEmpty) Seq.empty
      else v.agg(expr(s"approx_percentile(x, array(${qs.mkString(", ")}), 10000)"))
        .collect()(0).getSeq[Long](0)
    val pid =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds), b => col("x") >= b))
    val t = v.withColumn("_pid", pid)
    // Bounded-input invariant (r21 window audit): one row per _pid
    // bucket (≤ numPartitions rows), never the data rows.
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    val wB = Window.partitionBy(col("_pid")).orderBy(col("x"), col("id"))
    val global = t.join(broadcast(offsets), Seq("_pid"))
      .withColumn("grank", col("_off") + row_number().over(wB))
      .select(col("grank"), col("x").as("x_norm"))
    val tot = v.agg(count(lit(1)).as("n"))
    val wS = Window.partitionBy(col("grp")).orderBy(col("x"), col("id"))
    val ranked = v
      .withColumn("src_rank", row_number().over(wS).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .crossJoin(broadcast(tot))
      .withColumn(
        "g_rank",
        expr("(src_rank * n + ns - 1) div ns"))
    ranked
      .join(global, col("g_rank") === col("grank"))
      .select(
        col("id"), col("grp"), col("x"), col("src_rank"),
        col("g_rank"), col("x_norm"))
  }

  /** Per-group winsorization: clip an (exactly double-castable) measure to
    * its group's [`lo`, `hi`] quantiles — the standard outlier-taming pass
    * before scale-sensitive statistics. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the same linear interpolation over sorted
    * doubles, so the cutoffs are engine-bit-identical, and the clip itself
    * is pure comparison (`least`/`greatest`) — no arithmetic to drift.
    *
    * Scale shape: one map-side-combinable percentile aggregate (group-
    * count-sized output) broadcast back over the scan — the fact table is
    * read once and never shuffled.
    */
  def winsorize(
      df: DataFrame,
      group: Column,
      id: Column,
      x: Column,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val v = df.select(group.as("grp"), id.as("id"), x.cast("double").as("x"))
    val cuts = v.groupBy(col("grp"))
      .agg(
        expr(s"percentile(x, $lo)").as("p_lo"),
        expr(s"percentile(x, $hi)").as("p_hi"))
    v.join(broadcast(cuts), Seq("grp"))
      .select(
        col("grp"), col("id"), col("x"),
        least(greatest(col("x"), col("p_lo")), col("p_hi")).as("x_clipped"))
  }

  /** Per-group robust outlier detection via median/MAD — the
    * heavy-tail-safe alternative to mean/stddev z-scores (one extreme
    * value inflates a stddev enough to hide ITSELF; the median absolute
    * deviation has a 50% breakdown point — Hampel's rule). Per row:
    * the group median, the group MAD, the robust z-score
    * `(x − med)/(1.4826·mad)` (the Gaussian-consistency constant), and
    * `is_outlier = |x − med| > k·1.4826·mad`. Spark `percentile` and
    * DuckDB `quantile_cont` share the same sorted-doubles interpolation
    * (the [[winsorize]]/q71 precedent), and everything downstream is a
    * fixed tree of single IEEE ops on those identical inputs — bit-
    * identical across engines. A zero-MAD group (over half the values
    * at the median) yields NULL z and FALSE flags: no finite threshold
    * exists, surfaced the same way in both engines.
    *
    * Scale: two group-count-sized percentile aggregates (median of x,
    * then median of |x − med|) each broadcast back over the scan — the
    * fact table is read twice and never shuffled ([[winsorize]]'s
    * shape, one extra pass for the nested median).
    */
  def robustOutliers(
      df: DataFrame,
      group: Column,
      id: Column,
      x: Column,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val v = df.select(group.as("grp"), id.as("id"), x.cast("double").as("x"))
    val med = v.groupBy(col("grp")).agg(expr("percentile(x, 0.5)").as("med"))
    val dev = v.join(broadcast(med), Seq("grp"))
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("grp")).agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("grp"))
      .withColumn("cutoff", lit(k) * lit(1.4826) * col("mad"))
      .select(
        col("grp"), col("id"), col("x"), col("med"), col("mad"),
        when(col("mad") > 0d, (col("x") - col("med")) / (lit(1.4826) * col("mad")))
          .as("robust_z"),
        (col("mad") > 0d && col("adev") > col("cutoff")).as("is_outlier"))
  }

  /** Per-group MERGEABLE approximate quantiles — the 100 TB path where
    * exact `percentile` (which buffers each group's full value multiset
    * in the aggregation state) stops being viable. Built on Spark's
    * `approx_percentile`, i.e. the Greenwald–Khanna quantile summary:
    * the sketch is a bounded set of (value, g, Δ) tuples, partial
    * aggregation builds one per map task, and the reduce side MERGES
    * summaries instead of concatenating values — state is
    * O(accuracy·log(εn)) per group regardless of group size, and the
    * documented guarantee is rank error ≤ n/accuracy.
    *
    * Exact `percentile` ([[winsorize]], q34/q57) stays the right call
    * when groups are modest and the oracle gate needs bit-equal
    * interpolated values; this is the drop-in for corpus-scale groups.
    * Output: (grp, n, aq: array<double>) with `aq(i)` ≈ the `ps(i)`
    * quantile — an actual element of the group, per GK semantics.
    */
  def approxQuantiles(
      df: DataFrame,
      group: Column,
      x: Column,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 1000): DataFrame = {
    val psSql = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    df.select(group.as("grp"), x.cast("double").as("x"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        expr(s"approx_percentile(x, $psSql, $accuracy)").as("aq"))
  }

  /** [[approxQuantiles]] with its error bound made checkable: for each
    * (group, p) the sketch's answer `v` is graded against the EXACT rank
    * of `v` in the group — `rank_ok` iff the documented GK bound
    * (rank error ≤ εn, ε = 1/accuracy) holds, duplicate-safe by checking
    * both rank boundaries (`count(x < v)` and `count(x ≤ v)`) with one
    * row of slack for the discrete-rank convention. This is the
    * error-bound gating shape: an exact-quantile oracle can assert
    * `rank_ok = true` without being able to reproduce the approximate
    * value itself.
    *
    * Scale shape: the sketch aggregate plus ONE broadcast of the
    * (groups × ps)-sized cutoff table back over the scan — two passes,
    * no fact-table shuffle (the rank counts are map-side combined).
    */
  def approxQuantileRankCheck(
      df: DataFrame,
      group: Column,
      x: Column,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 1000): DataFrame = {
    val eps = 1.0 / accuracy
    val v = df.select(group.as("grp"), x.cast("double").as("x"))
    val psCol = array(ps.map(lit): _*)
    val cuts = approxQuantiles(df, group, x, ps, accuracy)
      .select(col("grp"), col("n"), posexplode(col("aq")).as(Seq("pi", "v")))
      .select(col("grp"), col("n"), element_at(psCol, col("pi") + 1).as("p"), col("v"))
    v.join(broadcast(cuts), Seq("grp"))
      .groupBy(col("grp"), col("p"), col("n"))
      .agg(
        sum(when(col("x") < col("v"), 1L).otherwise(0L)).as("r_lo"),
        sum(when(col("x") <= col("v"), 1L).otherwise(0L)).as("r_hi"))
      .select(
        col("grp"), col("p"), col("n"),
        (col("r_lo").cast("double") - 1.0 <= (col("p") + eps) * col("n").cast("double") &&
          col("r_hi").cast("double") + 1.0 >= (col("p") - eps) * col("n").cast("double"))
          .as("rank_ok"))
  }

  /** Fixed-bin equi-width histogram of an integer measure: bin index
    * `min(bins−1, ⌊(x − lo)·bins / (hi − lo + 1)⌋)` over the observed
    * [lo, hi] — the +1 keeps `x = hi` inside the last bin without a
    * special case, and the `least` guard is belt-and-braces. The span is
    * ONE aggregate row broadcast back over the scan, so the whole
    * operator is two passes and one dimension-free shuffle (bins-sized
    * output). The floor division is exact: the operands are exact
    * integers ≪ 2^53, and an IEEE division whose true quotient is an
    * integer returns it exactly, so bin edges can't smear across engines.
    *
    * Complements [[graft.SparkEntry]]'s quantile binning (equi-DEPTH,
    * q57): equi-width answers "where is the mass", equi-depth "where are
    * the cutoffs".
    */
  def equiWidthHistogram(df: DataFrame, x: Column, bins: Int = 10): DataFrame = {
    val v = df.select(x.cast("long").as("x"))
    val span = v.agg(min("x").as("lo"), max("x").as("hi"))
    v.crossJoin(broadcast(span))
      .select(
        col("x"),
        least(
          lit(bins - 1),
          floor(((col("x") - col("lo")) * bins).cast("double") /
            (col("hi") - col("lo") + 1).cast("double")).cast("int")).as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("x_min"),
        max(col("x")).as("x_max"))
  }

  /** Per-group ranking AUC (Mann–Whitney U) as EXACT pair counts — the
    * "does this score actually separate the labels" audit a ranking
    * pipeline runs on its training examples. For each group:
    * `concordant` = #{(pos, neg) score pairs with pos > neg},
    * `tied` = #{pairs at equal score}, and
    * `AUC = (concordant + tied/2) / (n_pos·n_neg)` — the counts are
    * BIGINT-exact (no float rank sums), the one division is IEEE on
    * exact integers, so the statistic is engine-bit-identical. Groups
    * with only one class have no pairs and are dropped.
    *
    * Not O(n²): scores aggregate to per-(group, score) class counts
    * first, then one ordered window per group turns the counts into
    * pair totals (`Σ c_neg(s)·pos_above(s)`), so work is linear in
    * distinct scores after a map-side-combined aggregate.
    *
    * Scale: two shuffles, both keyed by the group (the window reuses the
    * aggregate's partitioning); no per-row state beyond the running sum.
    */
  def groupAuc(df: DataFrame, group: Column, score: Column, label: Column): DataFrame = {
    val v = df
      .select(group.as("grp"), score.cast("double").as("s"), label.cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val perScore = v
      .groupBy(col("grp"), col("s"))
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
    val cum = Window.partitionBy(col("grp")).orderBy(col("s"))
    val tot = Window.partitionBy(col("grp"))
    perScore
      .withColumn("cum_pos_le", sum(col("c_pos")).over(cum))
      .withColumn("n_pos", sum(col("c_pos")).over(tot))
      .withColumn("n_neg", sum(col("c_neg")).over(tot))
      .groupBy(col("grp"), col("n_pos"), col("n_neg"))
      .agg(
        sum(col("c_neg") * (col("n_pos") - col("cum_pos_le"))).as("concordant"),
        sum(col("c_pos") * col("c_neg")).as("tied"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .withColumn(
        "auc",
        (col("concordant").cast("double") + col("tied").cast("double") / 2.0d) /
          (col("n_pos") * col("n_neg")).cast("double"))
      .select(
        col("grp"), col("n_pos"), col("n_neg"),
        col("concordant"), col("tied"), col("auc"))
  }

  /** Calibration (reliability-diagram) bins — the eval-side complement to
    * [[groupAuc]]: AUC says whether a score ORDERS the labels, this says
    * whether its MAGNITUDE means what it claims (a quality classifier
    * whose 0.9-bucket is only 60% positive needs recalibration before
    * its scores gate a corpus). Scores land in `bins` equal-WIDTH bins
    * over the observed range (the standard reliability-diagram binning —
    * no global sort, unlike equal-count ntiles); each bin reports exact
    * BIGINT counts, the empirical positive rate in ppm, and the mean
    * score in centi-units — both via floor division, so every cell is
    * engine-bit-identical. Scores quantize at two decimals through the
    * round(s·100) BIGINT path (q77's proven decimal bridge); a
    * degenerate lo == hi range puts everything in bin 0.
    *
    * Scale: one scalar extremes aggregate broadcast back, then ONE
    * map-side-combined groupBy over ≤ `bins` groups — the corpus is
    * scanned twice and never reshuffled beyond the bin-count-sized agg.
    */
  def calibrationBins(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins=$bins out of range [2, 1000]")
    val v = df
      .select(score.cast("double").as("s"), label.cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .withColumn("s_centi", round(col("s") * 100, 0).cast("long"))
    val ext = v.agg(min(col("s_centi")).as("lo"), max(col("s_centi")).as("hi"))
    v.crossJoin(broadcast(ext))
      // Clamped on BOTH ends: the top via least() (s_centi == hi lands in
      // bins-1, not bins), the bottom via greatest() so a source that
      // mutates between the two scans (extremes, then binning) can at
      // worst misbin — never emit a negative bin row the oracle's
      // deterministic replay would not have.
      .withColumn(
        "bin",
        greatest(
          lit(0L),
          least(
            lit(bins - 1L),
            expr(s"(($bins * (s_centi - lo)) div (hi - lo + 1))"))).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("s_centi")).as("sum_score_centi"),
        min(col("lo")).as("lo"))
      .withColumn("pos_rate_ppm", expr("(1000000 * n_pos) div n"))
      // Mean via the lo-shift so the division operand is NONNEGATIVE even
      // for signed scores (logits): Spark `div` truncates toward zero,
      // DuckDB `//` floors — they only agree above zero, and
      // `lo + floor(Σ(s−lo)/n)` is the exact floor of the mean.
      .withColumn(
        "mean_score_centi",
        expr("lo + ((sum_score_centi - n * lo) div n)"))
      .drop("lo")
  }

  /** One-pass table profiler — the data-quality report every warehouse
    * runs before trusting a new source: per column, the row count, the
    * null count, the EXACT distinct count, and (for numeric/timestamp
    * columns) the min/max surfaced as doubles (timestamps as epoch
    * micros — exact in the 53-bit mantissa for any realistic range;
    * string columns report NULL bounds). The numbers every ingest gate
    * reads first: unexpected nulls, exploded cardinality, out-of-range
    * values.
    *
    * Scale: ONE aggregate computes every column's stats in a single
    * pass — the multi-distinct plan is Spark's Expand (input ×
    * column-count in the shuffle, the inherent cost of exact per-column
    * distincts; swap in HLL sketches when approximate is acceptable) —
    * then one row per column unpivots from the single result row.
    */
  def profileColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.toSeq
    // TimestampNTZType is a distinct Catalyst type (and what the UTC-
    // session parquet readers here surface); the cast to TIMESTAMP is
    // instant-preserving under the engine's fixed UTC session zone.
    // Backtick-quote the raw field name (doubling embedded backticks) so
    // even a top-level column literally named `a.b` resolves as ONE
    // attribute: both col() AND Dataset.col parse unquoted dots as
    // struct-field access (resolveQuoted/parseAttributeName), so the
    // quoting — not the df(...) accessor — is what makes dotted names
    // safe. Intermediate aliases are index-based so a hostile name can't
    // corrupt the alias or its reference.
    def fieldCol(name: String): Column = df(s"`${name.replace("`", "``")}`")
    def numExpr(f: StructField): Column = f.dataType match {
      case _: NumericType => fieldCol(f.name).cast("double")
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(fieldCol(f.name).cast("timestamp")).cast("double")
      case _ => lit(null).cast("double")
    }
    val aggs = cols.zipWithIndex.flatMap { case (f, i) =>
      Seq(
        count(fieldCol(f.name)).as(s"_nn_$i"),
        countDistinct(fieldCol(f.name)).as(s"_nd_$i"),
        min(numExpr(f)).as(s"_mn_$i"),
        max(numExpr(f)).as(s"_mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    wide.select(explode(array(cols.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$i")).as("n_null"),
        col(s"_nd_$i").as("n_distinct"),
        col(s"_mn_$i").as("min_num"),
        col(s"_mx_$i").as("max_num"))
    }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Benford first-digit audit — the classic fabricated-data /
    * broken-ingest tripwire: naturally-occurring positive amounts
    * follow `P(d) = log10(1 + 1/d)`; a uniform or spiked first-digit
    * histogram flags synthetic or truncated values. Digits are
    * extracted WITHOUT floating logs (a libm log10 at a power-of-ten
    * boundary is exactly the cross-engine drift this engine bans):
    * values quantize to integer centi-units through the proven
    * round(x·100) bridge and the first digit is the first character of
    * the integer's decimal string — integer-to-string is exact and
    * identical in both engines. Output per digit 1..9: the observed
    * count and exact-ppm share (digits with zero observations emit 0
    * via the dense digit spine). Comparison against the Benford ppm
    * expectations (301030, 176091, …) is the consumer's one join.
    *
    * Scale: one filter + one map-side-combined 9-group aggregate.
    */
  def benfordDigits(df: DataFrame, x: Column): DataFrame = {
    val v = df.select(round(x.cast("double") * 100, 0).cast("long").as("v"))
      .filter(col("v") > 0L)
    val obs = v
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val spine = df.sparkSession.range(1, 10).toDF("digit")
    val tot = v.agg(count(lit(1)).as("n"))
    spine.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("n").as("n_total"),
        when(col("n") > 0L,
          expr("(1000000 * coalesce(n_obs, 0)) div n")).as("obs_ppm"))
  }

  /** Cluster purity against a labeled subset — the standard external
    * clustering eval (purity = weighted majority-label share): per
    * cluster, its size over the labeled rows, the majority label (ties
    * break on the smaller label — deterministic), the majority count,
    * and the exact-ppm purity. The corpus-level score is the
    * n-weighted mean of these rows; emitting per-cluster cells keeps
    * the output inspectable (which clusters are mixed?) and the
    * aggregate derivable.
    *
    * Scale: one map-side-combined count to (cluster, label) cells —
    * bounded by clusters × observed labels — then a window over each
    * cluster's label cells. Nothing row-scale survives the first
    * aggregate.
    */
  def clusterPurity(assign: DataFrame, labels: DataFrame): DataFrame = {
    val cell = assign.join(labels, Seq("id"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("cluster")).orderBy(col("cnt").desc, col("label"))
    val tot = Window.partitionBy(col("cluster"))
    cell
      .withColumn("rn", row_number().over(w))
      .withColumn("n", sum(col("cnt")).over(tot))
      .filter(col("rn") === 1)
      .select(
        col("cluster"), col("n"), col("label").as("top_label"),
        col("cnt").as("n_top"),
        expr("(1000000 * cnt) div n").as("purity_ppm"))
  }

  /** Exact ROC curve points — the threshold-sweep view [[groupAuc]]
    * integrates and [[calibrationBins]] marginalizes: per group, one row
    * per distinct observed score threshold with the exact confusion
    * prefix at "predict positive when score ≥ threshold". Operating-point
    * selection (recall floors, precision gates) reads THIS table; AUC
    * alone can't pick a threshold. Scores quantize to centi-units through
    * the round(s·100) BIGINT path (q77's proven decimal bridge), so every
    * column is integer: tp/fp counts by a descending cumulative window,
    * tpr/fpr/precision as ppm floor divisions. `tp + fp ≥ 1` at every
    * observed threshold (the threshold's own rows are in the prefix), so
    * the precision division is never undefined; groups lacking a class
    * are dropped (no TPR or FPR exists), matching [[groupAuc]].
    *
    * Scale: one map-side-combined groupBy down to distinct
    * (group, threshold) cells, then one exchange on the group key shared
    * by the cumulative and total windows — the curve's row count is
    * bounded by distinct quantized scores per group, never raw rows.
    */
  def rocCurve(
      df: DataFrame,
      group: Column,
      score: Column,
      label: Column): DataFrame = {
    val v = df
      .select(group.as("grp"), score.cast("double").as("s"), label.cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .withColumn("thr_centi", round(col("s") * 100, 0).cast("long"))
    val perThr = v.groupBy(col("grp"), col("thr_centi"))
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
    val desc = Window.partitionBy(col("grp")).orderBy(col("thr_centi").desc)
    val tot = Window.partitionBy(col("grp"))
    perThr
      .withColumn("tp", sum(col("c_pos")).over(desc))
      .withColumn("fp", sum(col("c_neg")).over(desc))
      .withColumn("n_pos", sum(col("c_pos")).over(tot))
      .withColumn("n_neg", sum(col("c_neg")).over(tot))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(
        col("grp"), col("thr_centi"), col("tp"), col("fp"),
        col("n_pos"), col("n_neg"),
        expr("(1000000 * tp) div n_pos").as("tpr_ppm"),
        expr("(1000000 * fp) div n_neg").as("fpr_ppm"),
        expr("(1000000 * tp) div (tp + fp)").as("precision_ppm"))
  }

  /** Binary-classifier confusion matrix + exact ppm summary metrics —
    * the acceptance scorecard for every gate in the curation stack (is
    * the learned quality scorer faithful to its teacher? does the
    * cheap language-ID agree with the expensive one on the overlap
    * sample?), complementing [[groupAuc]] (threshold-free ordering)
    * and [[calibrationBins]] (score-magnitude honesty) with the
    * AT-THRESHOLD picture. One row: tp/fp/fn/tn counts plus accuracy,
    * precision, recall, and F1 in exact ppm BIGINTs (floor division on
    * nonnegative operands — engine-bit-identical; F1 computes from the
    * ppm precision/recall, `(2·p·r) div (p + r)`, ≤ 2·10¹² inside
    * BIGINT always). Undefined metrics (no predicted positives / no
    * actual positives) surface as NULL in BOTH engines rather than a
    * conventional zero.
    *
    * Scale: one map-side-combined four-counter aggregate over a narrow
    * two-boolean projection — a single reduce to one row, no shuffle
    * wider than the partial aggregates.
    */
  def classifierEval(df: DataFrame, pred: Column, label: Column): DataFrame =
    df
      .select(pred.cast("boolean").as("p"), label.cast("boolean").as("y"))
      .filter(col("p").isNotNull && col("y").isNotNull)
      .agg(
        sum(when(col("p") && col("y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") && !col("y"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("p") && col("y"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("p") && !col("y"), 1L).otherwise(0L)).as("tn"))
      .withColumn(
        "accuracy_ppm", expr("(1000000 * (tp + tn)) div (tp + fp + fn + tn)"))
      .withColumn(
        "precision_ppm",
        when(col("tp") + col("fp") > 0L, expr("(1000000 * tp) div (tp + fp)")))
      .withColumn(
        "recall_ppm",
        when(col("tp") + col("fn") > 0L, expr("(1000000 * tp) div (tp + fn)")))
      .withColumn(
        "f1_ppm",
        when(
          col("precision_ppm").isNotNull && col("recall_ppm").isNotNull &&
            col("precision_ppm") + col("recall_ppm") > 0L,
          expr("(2 * precision_ppm * recall_ppm) div (precision_ppm + recall_ppm)")))

  /** NDCG@k with an exact integer discount — the graded-relevance
    * ranking eval next to [[groupAuc]]'s binary ordering and
    * `Similarity.annRecall`'s set recall: did the ranker put HIGH-grade
    * items EARLY? Per query over the top-`k` ranked rows
    * `(query_id, rnk, rel)`: each row contributes
    * `⌊10⁶·rel / d(rnk)⌋` with the whole-bit discount
    * `d(r) = ⌊log2(r + 1)⌋ = length(bin(r + 1)) − 1` (the classic
    * `log2(r + 1)` curve floored to integers — d(1) = d(2) = 1,
    * d(3..6) = 2, … — so the metric is BIGINT end to end and
    * engine-bit-identical where a float log would drift); the ideal
    * ordering re-ranks the same rows by `(rel desc, rnk)` and the
    * summary is `ndcg_ppm = ⌊10⁶·dcg / idcg⌋`, NULL when every grade
    * is zero (no ideal gain to normalize by — NULL in both engines).
    *
    * Scale: one per-query window (rank-bounded input by construction —
    * k rows per query) + one map-side-combined aggregate; nothing
    * corpus-sized shuffles.
    */
  def ndcgAtK(runs: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rel").desc, col("rnk"))
    runs
      .select(col("query_id"), col("rnk").cast("long").as("rnk"), col("rel").cast("long").as("rel"))
      .filter(col("rnk") <= k.toLong)
      .withColumn("irnk", row_number().over(wIdeal).cast("long"))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("(1000000 * rel) div (length(bin(rnk + 1)) - 1)")).as("dcg_m"),
        sum(expr("(1000000 * rel) div (length(bin(irnk + 1)) - 1)")).as("idcg_m"))
      .withColumn(
        "ndcg_ppm",
        when(col("idcg_m") > 0L, expr("(1000000 * dcg_m) div idcg_m")))
  }

  /** Average precision @ k — the order-sensitive BINARY-relevance
    * ranking eval between `annRecall`'s order-blind set recall and
    * [[ndcgAtK]]'s graded gains: every relevant item contributes the
    * precision at its own rank, so relevant items ranked EARLY count
    * for more. Per query over the top-`k` rows `(query_id, rnk, rel)`
    * with 0/1 `rel`: each hit at rank r contributes
    * `⌊10⁶·hits_so_far(r) / r⌋` (exact floor division — hits_so_far
    * via one cumulative window ordered by rank), and
    * `ap_ppm = ⌊Σ contributions / hits⌋` — the mean of the per-hit ppm
    * precisions, floored term-by-term FIRST so the whole metric stays
    * BIGINT and engine-bit-identical (the spec is "mean of floored
    * precisions", not a float AP rounded). Queries with zero hits get
    * NULL (no relevant item to average over — NULL in both engines).
    *
    * Scale: one per-query cumulative window over rank-bounded input
    * (≤ k rows per query by construction) + one map-side-combined
    * aggregate; nothing corpus-sized shuffles.
    */
  def averagePrecision(runs: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rnk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    runs
      .select(col("query_id"), col("rnk").cast("long").as("rnk"), col("rel").cast("long").as("rel"))
      .filter(col("rnk") <= k.toLong)
      .withColumn("cum_hits", sum(col("rel")).over(wCum))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rel")).as("hits"),
        sum(expr("CASE WHEN rel = 1 THEN (1000000 * cum_hits) div rnk ELSE 0 END"))
          .as("sum_prec_ppm"))
      .withColumn("ap_ppm", when(col("hits") > 0L, expr("sum_prec_ppm div hits")))
      .drop("sum_prec_ppm")
  }

  /** Reciprocal rank of the first relevant hit per ranked run — the
    * known-item / navigational eval next to [[averagePrecision]]'s
    * order-sensitive average: "how deep does a user dig before the
    * first good result?". Exact ppm (`⌊10⁶/first_rel_rank⌋`, 0 when no
    * hit lands in the top k — the standard MRR convention); the mean
    * over queries is the consumer's one division. Input is the same
    * `(query_id, rnk, rel)` run shape every ranking eval here shares.
    *
    * Scale: one filter + one map-side-combinable min/count aggregate
    * per query — no window, no join.
    */
  def reciprocalRank(runs: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    runs
      .select(col("query_id"), col("rnk").cast("long").as("rnk"), col("rel").cast("long").as("rel"))
      .filter(col("rnk") <= k.toLong)
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n"),
        min(when(col("rel") > 0L, col("rnk"))).as("first_rel_rank"))
      .withColumn("rr_ppm", coalesce(expr("1000000 div first_rel_rank"), lit(0L)))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (a cheap gate vs its expensive teacher, two annotators, two
    * model versions), the "is the agreement better than the base rates
    * explain?" eval that raw accuracy (q165's scorecard) cannot answer:
    * a 95%-majority-class pair of raters agrees 90% by luck alone.
    * `κ = (pₒ − pₑ)/(1 − pₑ)` with `pₒ` the observed agreement and
    * `pₑ = Σ_c rowshare(c)·colshare(c)` the chance agreement, computed
    * here entirely on exact integers:
    * `kappa_ppm = ±⌊10⁶·|n·agree − Σ rᶜ·cᶜ| / (n² − Σ rᶜ·cᶜ)⌋` with the
    * sign split out so truncation-toward-zero matches in both engines
    * (Spark `div` truncates, DuckDB `//` floors — they agree only on
    * nonnegative operands; κ can be negative). The n² products are
    * carried as DECIMAL(38,0) (HUGEINT width in the oracle), so the
    * operator is exact at any realistic corpus size, not just while
    * `n² < 9.2·10¹⁸`. Degenerate marginals (pₑ = 1: both raters
    * constant and equal) yield NULL. Also emits `po_ppm`/`pe_ppm`.
    *
    * Scale: one categories²-sized contingency aggregate with map-side
    * combine, then category-sized marginal scans — the totals, row-
    * marginal, and column-marginal subtrees are all built from the SAME
    * `cells` frame, so Catalyst's ReuseExchange serves them from the
    * one corpus-sized aggregate exchange (the tokenBudgetSelect totals
    * trick); no session-lifetime cache, nothing row-sized past the
    * first aggregate.
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 0)
    val cells = df
      .select(a.cast("string").as("ca"), b.cast("string").as("cb"))
      .filter(col("ca").isNotNull && col("cb").isNotNull)
      .groupBy(col("ca"), col("cb"))
      .agg(count(lit(1)).as("cnt"))
    val totals = cells.agg(
      sum(col("cnt")).as("n"),
      sum(when(col("ca") === col("cb"), col("cnt")).otherwise(0L)).as("agree"))
    val rowTot = cells.groupBy(col("ca").as("cat")).agg(sum(col("cnt")).as("rt"))
    val colTot = cells.groupBy(col("cb").as("cat")).agg(sum(col("cnt")).as("ct"))
    val peNum = rowTot
      .join(colTot, Seq("cat"))
      .agg(coalesce(sum(col("rt").cast(dec) * col("ct").cast(dec)), lit(0).cast(dec)).as("pe_num"))
    val out = totals
      .crossJoin(broadcast(peNum))
      .select(
        col("n"),
        col("agree"),
        (col("n").cast(dec) * col("agree").cast(dec)).as("po_num_n2"),
        col("pe_num"),
        (col("n").cast(dec) * col("n").cast(dec)).as("n2"))
      .withColumn("po_ppm", expr("(1000000 * agree) div n"))
      // IntegralDivide (`div`) on DECIMAL operands is exact truncation —
      // a decimal `/` would round HALF_UP at the result scale and could
      // cross an integer boundary the oracle's floor never crosses.
      .withColumn("pe_ppm", expr("(1000000 * pe_num) div n2"))
      .withColumn("k_num", col("po_num_n2") - col("pe_num"))
      .withColumn("k_den", col("n2") - col("pe_num"))
      .withColumn(
        "kappa_ppm",
        when(
          col("k_den") > lit(0).cast(dec),
          when(col("k_num") >= lit(0).cast(dec), expr("(1000000 * k_num) div k_den"))
            .otherwise(-expr("(1000000 * -k_num) div k_den"))))
      .select(col("n"), col("agree"), col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
    out
  }

  /** Kendall rank correlation (τ-a) between two rankings of the same
    * items — do two rankers ORDER a result list the same way (cosine vs
    * L2, last week's index vs this week's), the pairwise-order
    * complement to `annRecall`'s membership view. Input is one row per
    * `(query_id, item_id)` carrying both tie-free ranks (`rank_a`,
    * `rank_b` — row_number ranks by construction here, so τ-a's
    * no-ties denominator `n(n−1)/2` is exact and τ-b's tie terms
    * vanish). Pairs expand per query via an `item < item` self-join —
    * bounded by the depth of the ranked lists (k² pairs per query),
    * never corpus-sized; concordant ⟺ the two rank differences share a
    * sign. `tau_ppm = ±⌊10⁶·|C − D| / (n(n−1)/2)⌋`, sign split out so
    * trunc-division matches across engines; single-item queries (no
    * pairs) yield NULL.
    */
  def kendallTau(ranks: DataFrame): DataFrame = {
    val l = ranks.select(
      col("query_id"), col("item_id").as("ia"),
      col("rank_a").cast("long").as("raa"), col("rank_b").cast("long").as("rba"))
    val r = ranks.select(
      col("query_id"), col("item_id").as("ib"),
      col("rank_a").cast("long").as("rab"), col("rank_b").cast("long").as("rbb"))
    l.join(r, Seq("query_id"))
      .filter(col("ia") < col("ib"))
      .select(
        col("query_id"),
        ((col("raa") - col("rab")) * (col("rba") - col("rbb")) > 0L).as("conc"))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("conc"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("conc"), 0L).otherwise(1L)).as("discordant"))
      .join(
        ranks.groupBy(col("query_id")).agg(count(lit(1)).as("n_items")),
        Seq("query_id"),
        "right_outer")
      .select(
        col("query_id"),
        col("n_items"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"))
      .withColumn(
        "tau_ppm",
        when(
          col("n_items") > 1L,
          when(
            col("concordant") >= col("discordant"),
            expr("(1000000 * (concordant - discordant)) div ((n_items * (n_items - 1)) div 2)"))
            .otherwise(
              -expr("(1000000 * (discordant - concordant)) div ((n_items * (n_items - 1)) div 2)"))))
  }

  /** Mann–Whitney rank-sum test of an integer measure, each group
    * against the REST of the pooled sample — the distribution-free
    * "did corpus version B shift the length/quality distribution?"
    * check a pipeline team runs before trusting per-source means
    * ([[groupedStats]] assumes the mean is the story; this does not).
    *
    * One pooled ranking serves every comparison: midranks come from the
    * per-distinct-value counts (`2·midrank(v) = 2·|{u < v}| + n_v + 1`
    * — integer, so ties cost no fractions), each group's doubled rank
    * sum `R·2` folds over its value counts, and the classic identities
    * give exact integers end to end:
    * {{{
    *   U·2        = R·2 − n1(n1+1)            // doubled Mann-Whitney U
    *   delta      = U·2 − n1·n2               // 2(U − E[U]); sign = direction
    *   cles_ppm   = ⌊10⁶·U·2 / (2·n1·n2)⌋     // P(group value > rest), ties half
    *   z2_micro   = ⌊10⁶·3·delta²·n(n−1) / (n1·n2·(n(n−1)(n+1) − T))⌋
    * }}}
    * with `T = Σ(t³−t)` the standard tie correction — `z2_micro` is the
    * SQUARED normal-approximation z-score in micro-units (one-sided
    * direction is `delta`'s sign), carried in DECIMAL(38,0)/HUGEINT.
    * Headroom: the numerator is ≤ 3·10⁶·n⁶/16, exact to n ≈ 2·10⁵
    * pooled rows ([[graft.functions.TextAnalysis.chiSquareTerms]]'s
    * documented-headroom convention); an all-tied pool (every value
    * equal) makes the variance 0 and yields NULL, not a division error.
    *
    * Scale: two value-keyed aggregates (map-side combined) + one window
    * over DISTINCT measure values — state is bounded by the value
    * domain (lengths, centi-scores), never row count — then a
    * group-count-sized agg and one broadcast of the 1-row totals.
    */
  def rankSumTest(df: DataFrame, group: Column, x: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 0)
    val v = df
      .select(group.cast("string").as("grp"), x.cast("long").as("x"))
      .filter(col("grp").isNotNull && col("x").isNotNull)
    val perVal = v.groupBy(col("x")).agg(count(lit(1)).as("n_v"))
    // Bounded-input invariant (r21 window audit): the cumulative window
    // walks DISTINCT measure values (the scaladoc's value-domain bound —
    // lengths, centi-scores), never the pooled rows.
    val wcum = Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal
      .withColumn("cum_less", coalesce(sum(col("n_v")).over(wcum), lit(0L)))
      .withColumn("mid2", lit(2L) * col("cum_less") + col("n_v") + lit(1L))
    val tot = perVal.agg(
      sum(col("n_v")).as("n"),
      sum(col("n_v") * col("n_v") * col("n_v") - col("n_v")).as("tie_sum"))
    val n1d = col("n1").cast(dec)
    val n2d = col("n2").cast(dec)
    val nd = col("n").cast(dec)
    val deltaD = col("delta").cast(dec)
    v.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).as("n_gv"))
      .join(ranked, Seq("x"))
      .groupBy(col("grp"))
      .agg(sum(col("n_gv") * col("mid2")).as("r_x2"), sum(col("n_gv")).as("n1"))
      .crossJoin(broadcast(tot))
      .withColumn("n2", col("n") - col("n1"))
      .withColumn("u_x2", col("r_x2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("delta", col("u_x2") - col("n1") * col("n2"))
      .withColumn(
        "cles_ppm",
        when(col("n1") > 0L && col("n2") > 0L,
          expr("(1000000 * u_x2) div (2 * n1 * n2)")))
      .withColumn(
        "_num",
        lit(3000000L).cast(dec) * deltaD * deltaD * nd * (nd - lit(1L).cast(dec)))
      .withColumn(
        "_den",
        n1d * n2d * (nd * (nd - lit(1L).cast(dec)) * (nd + lit(1L).cast(dec)) -
          col("tie_sum").cast(dec)))
      .withColumn(
        "z2_micro",
        when(col("_den") > lit(0L).cast(dec),
          expr("_num div _den").cast("long")))
      .select(
        col("grp"), col("n1"), col("n2"), col("u_x2"), col("delta"),
        col("cles_ppm"), col("z2_micro"))
  }
}

package graft.functions

import graft.core.Panel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series feature extractors (tsfresh-style), re-expressed as Spark
  * SQL compositions — the `pl.Expr` path of the reference
  * (reference: functime/feature_extractors.py, see SURVEY.md §2.3).
  *
  * Two layers:
  *   - pure aggregate `Column`s (usable directly in `groupBy(entity).agg`)
  *   - `Panel => DataFrame` for features needing per-entity ordered
  *     windows (lag/lead/cumsum/run-length); these add window columns
  *     first, then aggregate. All windows share the panel's single
  *     partitionBy(entity).orderBy(time) spec, so the physical plan is
  *     one shuffle + one sort per entity regardless of feature count.
  *
  * Everything here stays inside whole-stage codegen: no UDFs, no
  * collects. The ~12 collect-based features (FFT, entropy family, …)
  * live in [[FeatureAggs]] as typed Aggregators instead.
  */
object Features {

  // ---------------------------------------------------------------
  // Pure aggregates (reference file:line cited per feature)
  // ---------------------------------------------------------------

  /** Σx² — feature_extractors.py:57 */
  def absoluteEnergy(x: Column): Column = sum(x * x)

  /** max(|min|,|max|) — feature_extractors.py:76 */
  def absoluteMaximum(x: Column): Column = greatest(abs(min(x)), abs(max(x)))

  /** 100·#(x≥t)/n — feature_extractors.py:520 */
  def countAbove(x: Column, t: Double): Column =
    sum(when(x >= t, 1).otherwise(0)) * lit(100.0) / count(x)

  /** 100·#(x≤t)/n — feature_extractors.py:555 */
  def countBelow(x: Column, t: Double): Column =
    sum(when(x <= t, 1).otherwise(0)) * lit(100.0) / count(x)

  /** any duplicated value — feature_extractors.py:775 */
  def hasDuplicate(x: Column): Column = count(x) > count_distinct(x)

  /** std > r·(max-min) — feature_extractors.py:854 */
  def largeStandardDeviation(x: Column, r: Double): Column =
    stddev_samp(x) > lit(r) * (max(x) - min(x))

  /** count in [l,u) — feature_extractors.py:1375 (default closed="left") */
  def rangeCount(x: Column, lower: Double, upper: Double): Column =
    sum(when(x >= lower && x < upper, 1).otherwise(0))

  /** n_unique/n — feature_extractors.py:1428 */
  def ratioNUniqueToLength(x: Column): Column =
    // try_divide: an all-null entity has count = 0 and ANSI double/0
    // would kill the job; null ratio matches DuckDB's double/0 = NULL
    try_divide(count_distinct(x).cast("double"), count(x))

  /** √(Σx²/n) — feature_extractors.py:1444 */
  def rootMeanSquare(x: Column): Column = sqrt(avg(x * x))

  /** |μ−median| < r·(max−min) — feature_extractors.py:1614 */
  def symmetryLooking(x: Column, r: Double): Column =
    abs(avg(x) - percentile(x, lit(0.5))) < lit(r) * (max(x) - min(x))

  /** σ_pop/μ — feature_extractors.py:1660 */
  def variationCoefficient(x: Column): Column = try_divide(stddev_pop(x), avg(x))

  /** var ≥ 1 — feature_extractors.py:1680 */
  def varGtStd(x: Column): Column = var_samp(x) >= 1.0

  /** n/Σ(1/x) — feature_extractors.py:1698. A zero VALUE must follow
    * the reference's arithmetic (1/0 = inf ⇒ mean 0), not null-skip:
    * try_divide on the reciprocal silently DROPPED zeros from the sum
    * and returned a plausible wrong mean over the remainder. */
  def harmonicMean(x: Column): Column = {
    val recip = when(x === 0.0, lit(Double.PositiveInfinity))
      .otherwise(try_divide(lit(1.0), x))
    try_divide(count(x).cast("double"), sum(recip))
  }

  /** (max−min)/μ — feature_extractors.py:1714 */
  def rangeOverMean(x: Column): Column = try_divide(max(x) - min(x), avg(x))

  /** max/min−1 (percentage=true) or max−min — feature_extractors.py:1730 */
  def rangeChange(x: Column, percentage: Boolean): Column =
    if (percentage) try_divide(max(x), min(x)) - lit(1.0) else max(x) - min(x)

  /** mean of k largest |x| — feature_extractors.py:1120 (top_k + mean) */
  def meanNAbsoluteMax(x: Column, k: Int): Column = {
    val arr = slice(sort_array(collect_list(abs(x)), asc = false), 1, k)
    // try_divide: an all-null entity gives an empty array (0.0 / 0
    // would be an ANSI job-killer)
    try_divide(aggregate(arr, lit(0.0), (acc, v) => acc + v), least(size(arr), lit(k)))
  }

  // ---------------------------------------------------------------
  // Panel-level features (need ordered per-entity windows)
  // ---------------------------------------------------------------

  /** Add Δx = x − lag(x,1) over the entity window, then aggregate. */
  private def aggDiff(p: Panel, f: Column => Column): DataFrame = {
    val d = p.df.withColumn("__d", p.x - lag(p.x, 1).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(f(col("__d")))
  }

  /** Σ|Δx| — feature_extractors.py:95 */
  def absoluteSumOfChanges(p: Panel): DataFrame =
    aggDiff(p, d => sum(abs(d)).as("absolute_sum_of_changes"))

  /** mean|Δx| — feature_extractors.py:1063 */
  def meanAbsChange(p: Panel): DataFrame =
    aggDiff(p, d => avg(abs(d)).as("mean_abs_change"))

  /** max|Δx| — feature_extractors.py:1079 */
  def maxAbsChange(p: Panel): DataFrame =
    aggDiff(p, d => max(abs(d)).as("max_abs_change"))

  /** (x_n−x_1)/(n−1), 0 if n≤1 — feature_extractors.py:1095 */
  def meanChange(p: Panel): DataFrame = {
    val d = p.df
      .withColumn("__first", first(p.x).over(p.w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__last", last(p.x).over(p.w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    Panel(d, p.entity, p.order, p.value).agg(
      when(count(p.x) > 1, (first(col("__last")) - first(col("__first"))) / (count(p.x) - 1))
        .otherwise(0.0).as("mean_change"))
  }

  /** (x_n−x_{n−1}−x_2+x_1)/(2(n−2)) — feature_extractors.py:1140 */
  def meanSecondDerivativeCentral(p: Panel): DataFrame = {
    val f = p.w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = p.df
      .withColumn("__x1", first(p.x).over(f))
      .withColumn("__x2", nth_value(p.x, 2).over(f))
      .withColumn("__xn", last(p.x).over(f))
      .withColumn("__xn1", nth_value(p.x, 2, ignoreNulls = false).over(
        Window.partitionBy(p.entityCols: _*).orderBy(p.orderCols.map(_.desc): _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    Panel(d, p.entity, p.order, p.value).agg(
      when(count(p.x) < 3, lit(Double.NaN))
        .otherwise((first(col("__xn")) - first(col("__xn1")) - first(col("__x2")) + first(col("__x1")))
          / (lit(2.0) * (count(p.x) - 2))).as("mean_second_derivative_central"))
  }

  /** lag-l autocorrelation — feature_extractors.py:231:
    * Σ(x_t−μ)(x_{t+l}−μ) / (σ²_pop·(n−l)) */
  def autocorrelation(p: Panel, l: Int): DataFrame = {
    val d = p.df
      .withColumn("__xl", lead(p.x, l).over(p.w))
      .withColumn("__mu", avg(p.x).over(p.we))
      .withColumn("__v", var_pop(p.x).over(p.we))
    Panel(d, p.entity, p.order, p.value).agg(
      try_divide(sum((p.x - col("__mu")) * (col("__xl") - col("__mu"))),
        first(col("__v")) * (count(p.x) - l)).as(s"autocorrelation"))
  }

  /** Σ x_t·x_{t+l}·x_{t+2l} / (n−2l) — feature_extractors.py:411 */
  def c3(p: Panel, l: Int): DataFrame = {
    val d = p.df
      .withColumn("__x1", lead(p.x, l).over(p.w))
      .withColumn("__x2", lead(p.x, 2 * l).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(
      try_divide(sum(p.x * col("__x1") * col("__x2")), (count(p.x) - 2 * l).cast("double")).as("c3"))
  }

  /** √Σ(Δx)² with optional z-normalization (ddof=0) —
    * feature_extractors.py:488 */
  def cidCe(p: Panel, normalize: Boolean): DataFrame = {
    val base =
      if (normalize)
        p.df.withColumn("__z",
          try_divide(p.x - avg(p.x).over(p.we), stddev_pop(p.x).over(p.we)))
      else p.df.withColumn("__z", p.x)
    val d = base.withColumn("__d", col("__z") - lag(col("__z"), 1).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(sqrt(sum(col("__d") * col("__d"))).as("cid_ce"))
  }

  /** count above / below entity mean — feature_extractors.py:539/:573 */
  def countAboveMean(p: Panel): DataFrame = countVsMean(p, above = true, "count_above_mean")
  def countBelowMean(p: Panel): DataFrame = countVsMean(p, above = false, "count_below_mean")

  private def countVsMean(p: Panel, above: Boolean, name: String): DataFrame = {
    val d = p.df.withColumn("__mu", avg(p.x).over(p.we))
    val cond = if (above) p.x > col("__mu") else p.x < col("__mu")
    Panel(d, p.entity, p.order, p.value).agg(sum(when(cond, 1).otherwise(0)).as(name))
  }

  /** argmax/n (first occurrence) — feature_extractors.py:661 */
  def firstLocationOfMaximum(p: Panel): DataFrame = locationOf(p, isMax = true, isFirst = true, "first_location_of_maximum")
  def firstLocationOfMinimum(p: Panel): DataFrame = locationOf(p, isMax = false, isFirst = true, "first_location_of_minimum")
  /** (last_idx+1)/n — feature_extractors.py:876 (1 − reversed argmax / n) */
  def lastLocationOfMaximum(p: Panel): DataFrame = locationOf(p, isMax = true, isFirst = false, "last_location_of_maximum")
  def lastLocationOfMinimum(p: Panel): DataFrame = locationOf(p, isMax = false, isFirst = false, "last_location_of_minimum")

  private def locationOf(p: Panel, isMax: Boolean, isFirst: Boolean, name: String): DataFrame = {
    val pr = p.withRowIdx()
    val ext = if (isMax) max(p.x).over(p.we) else min(p.x).over(p.we)
    val d = pr.df.withColumn("__ext", ext)
    val idx = when(p.x === col("__ext"), col("__rn"))
    val expr =
      if (isFirst) min(idx).cast("double") / count(p.x)
      else (max(idx) + 1).cast("double") / count(p.x)
    Panel(d, p.entity, p.order, p.value).agg(expr.as(name))
  }

  /** max occurs more than once — feature_extractors.py:791/:807 */
  def hasDuplicateMax(p: Panel): DataFrame = dupExtremum(p, isMax = true, "has_duplicate_max")
  def hasDuplicateMin(p: Panel): DataFrame = dupExtremum(p, isMax = false, "has_duplicate_min")

  private def dupExtremum(p: Panel, isMax: Boolean, name: String): DataFrame = {
    val ext = if (isMax) max(p.x).over(p.we) else min(p.x).over(p.we)
    val d = p.df.withColumn("__ext", ext)
    Panel(d, p.entity, p.order, p.value)
      .agg((sum(when(p.x === col("__ext"), 1).otherwise(0)) > 1).as(name))
  }

  /** relative index where q of Σ|x| mass is reached —
    * feature_extractors.py:823 (cumsum + search_sorted "left") */
  def indexMassQuantile(p: Panel, q: Double): DataFrame = {
    val pr = p.withRowIdx()
    val d = pr.df
      .withColumn("__cum", sum(abs(p.x)).over(p.w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum(abs(p.x)).over(p.we))
    Panel(d, p.entity, p.order, p.value).agg(
      ((min(when(col("__cum") >= lit(q) * col("__tot"), col("__rn"))) + 1).cast("double")
        / count(p.x)).as("index_mass_quantile"))
  }

  /** OLS vs 0..n−1: slope, intercept, rss — feature_extractors.py:956.
    * slope = covar_samp(x,i)/var_samp(i); rss expanded algebraically
    * (rss = (n−1)(var(x) − slope²·var(i))) so it's single-pass. */
  def linearTrend(p: Panel): DataFrame = {
    val pr = p.withRowIdx()
    val i = col("__rn").cast("double")
    val slope = covar_samp(p.x, i) / var_samp(i)
    val intercept = avg(p.x) - slope * avg(i)
    val rss = (count(p.x) - 1) * (var_samp(p.x) - pow(slope, 2) * var_samp(i))
    Panel(pr.df, p.entity, p.order, p.value)
      .agg(slope.as("slope"), intercept.as("intercept"), rss.as("rss"))
  }

  /** longest run of x>μ (x<μ) — feature_extractors.py:997/:1030 */
  def longestStreakAboveMean(p: Panel): DataFrame = longestStreakVsMean(p, above = true, "longest_streak_above_mean")
  def longestStreakBelowMean(p: Panel): DataFrame = longestStreakVsMean(p, above = false, "longest_streak_below_mean")

  private def longestStreakVsMean(p: Panel, above: Boolean, name: String): DataFrame = {
    val d = p.df.withColumn("__mu", avg(p.x).over(p.we))
    val cond = if (above) p.x > col("__mu") else p.x < col("__mu")
    longestRun(Panel(d, p.entity, p.order, p.value), cond, name)
  }

  /** longest run of Δx ≥ t (above) / Δx ≤ t (below) —
    * feature_extractors.py:1805/:1840; winning/losing = t=0 (:1874/:1891) */
  def longestStreakAbove(p: Panel, t: Double): DataFrame =
    longestDiffStreak(p, above = true, t, "longest_streak_above")
  def longestStreakBelow(p: Panel, t: Double): DataFrame =
    longestDiffStreak(p, above = false, t, "longest_streak_below")

  private def longestDiffStreak(p: Panel, above: Boolean, t: Double, name: String): DataFrame = {
    val d = p.df.withColumn("__d", p.x - lag(p.x, 1).over(p.w))
    val cond = if (above) col("__d") >= t else col("__d") <= t
    longestRun(Panel(d, p.entity, p.order, p.value), cond && col("__d").isNotNull, name)
  }

  /** Run-length (rle) idiom: run id = cumulative count of condition
    * flips; longest satisfied run per entity. Missing runs → 0
    * (reference null handling, feature_extractors.py:1783). */
  private def longestRun(p: Panel, cond: Column, name: String): DataFrame = {
    val d = p.df
      .withColumn("__c", cond)
      .withColumn("__flip",
        when(col("__c") <=> lag(col("__c"), 1).over(p.w), 0).otherwise(1))
      .withColumn("__rid", sum(col("__flip")).over(p.w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = d.filter(col("__c"))
      .groupBy((p.entityCols :+ col("__rid")): _*).agg(count(lit(1)).as("__len"))
    val perEntity = runs.groupBy(p.entityCols: _*).agg(max(col("__len")).as(name))
    // entities whose condition never holds: left join back to keep them at 0
    p.df.select(p.entityCols: _*).distinct()
      .join(perEntity, p.entity, "left")
      .withColumn(name, coalesce(col(name), lit(0L)))
  }

  /** count of sign changes of (x>m) — feature_extractors.py:1165 */
  def numberCrossings(p: Panel, m: Double): DataFrame = {
    val d = p.df
      .withColumn("__c", p.x > m)
      .withColumn("__pc", lag(p.x > m, 1).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(
      sum(when(col("__pc").isNotNull && !(col("__c") <=> col("__pc")), 1).otherwise(0))
        .as("number_crossings"))
  }

  /** points strictly greater than n neighbors on both sides —
    * feature_extractors.py:1276 */
  def numberPeaks(p: Panel, n: Int): DataFrame = {
    val isPeak = (1 to n).map { i =>
      p.x > lag(p.x, i).over(p.w) && p.x > lead(p.x, i).over(p.w)
    }.reduce(_ && _)
    val d = p.df.withColumn("__peak", coalesce(isPeak, lit(false)))
    Panel(d, p.entity, p.order, p.value)
      .agg(sum(when(col("__peak"), 1).otherwise(0)).as("number_peaks"))
  }

  /** share of |x−μ| > r·σ_pop — feature_extractors.py:1401 */
  def ratioBeyondRSigma(p: Panel, r: Double): DataFrame = {
    val d = p.df
      .withColumn("__mu", avg(p.x).over(p.we))
      .withColumn("__sd", stddev_pop(p.x).over(p.we))
    Panel(d, p.entity, p.order, p.value).agg(
      (sum(when(abs(p.x - col("__mu")) > lit(r) * col("__sd"), 1).otherwise(0)).cast("double")
        / count(p.x)).as("ratio_beyond_r_sigma"))
  }

  /** mean(x_{t+l}·(x_{t+2l}+x_t)·(x_{t+2l}−x_t)) — feature_extractors.py:1640 */
  def timeReversalAsymmetryStatistic(p: Panel, l: Int): DataFrame = {
    val d = p.df
      .withColumn("__x1", lead(p.x, l).over(p.w))
      .withColumn("__x2", lead(p.x, 2 * l).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(
      avg(col("__x1") * (col("__x2") + p.x) * (col("__x2") - p.x))
        .as("time_reversal_asymmetry_statistic"))
  }

  /** x² mass per k equal chunks / total — feature_extractors.py:628.
    * Emits one row per (entity, chunk) — Spark-friendlier than a list. */
  def energyRatios(p: Panel, k: Int): DataFrame = {
    val pr = p.withRowIdx()
    val d = pr.df
      .withColumn("__n", count(p.x).over(p.we))
      .withColumn("chunk", floor(col("__rn") * k / col("__n")))
      .withColumn("__tot", sum(p.x * p.x).over(p.we))
    d.groupBy((p.entityCols :+ col("chunk")): _*)
      .agg(try_divide(sum(p.x * p.x), first(col("__tot"))).as("energy_ratio"))
  }

  /** entropy of k-bin histogram — feature_extractors.py:380:
    * bin = floor((x−min)/(ε+(max−min)/k)), entropy over bin counts. */
  def binnedEntropy(p: Panel, k: Int): DataFrame = {
    val d = p.df
      .withColumn("__min", min(p.x).over(p.we))
      .withColumn("__max", max(p.x).over(p.we))
      .withColumn("__bin",
        floor((p.x - col("__min")) / (lit(1e-12) + (col("__max") - col("__min")) / k)))
    val counts = d.groupBy((p.entityCols :+ col("__bin")): _*).agg(count(lit(1)).as("__c"))
    entropyOfCounts(counts, p.entity, "__c", "binned_entropy")
  }

  /** −Σ p·ln p over a count column (normalize=true semantics). */
  def entropyOfCounts(counts: DataFrame, entity: Seq[String], countCol: String, out: String): DataFrame = {
    val tot = sum(col(countCol)).over(Window.partitionBy(entity.map(col): _*))
    counts.withColumn("__p", col(countCol) / tot)
      .groupBy(entity.map(col): _*)
      .agg((-sum(col("__p") * log(col("__p")))).as(out))
  }

  /** 1 − #unique-occurrence points/n — feature_extractors.py:1228 */
  def percentReoccurringPoints(p: Panel): DataFrame = {
    val vc = valueCounts(p)
    vc.groupBy(p.entityCols: _*).agg(
      (sum(when(col("__c") > 1, col("__c")).otherwise(0)).cast("double") / sum(col("__c")))
        .as("percent_reoccurring_points"))
  }

  /** #(values occurring >1) / #distinct — feature_extractors.py:1252 */
  def percentReoccurringValues(p: Panel): DataFrame = {
    val vc = valueCounts(p)
    vc.groupBy(p.entityCols: _*).agg(
      (sum(when(col("__c") > 1, 1).otherwise(0)).cast("double") / count(lit(1)))
        .as("percent_reoccurring_values"))
  }

  /** Σ of all duplicated points — feature_extractors.py:1565 */
  def sumReoccurringPoints(p: Panel): DataFrame = {
    val vc = valueCounts(p)
    vc.groupBy(p.entityCols: _*).agg(
      sum(when(col("__c") > 1, p.x * col("__c")).otherwise(0.0)).as("sum_reoccurring_points"))
  }

  /** Σ of distinct duplicated values — feature_extractors.py:1587 */
  def sumReoccurringValues(p: Panel): DataFrame = {
    val vc = valueCounts(p)
    vc.groupBy(p.entityCols: _*).agg(
      sum(when(col("__c") > 1, p.x).otherwise(0.0)).as("sum_reoccurring_values"))
  }

  private def valueCounts(p: Panel): DataFrame =
    p.df.groupBy((p.entityCols :+ p.x): _*).agg(count(lit(1)).as("__c"))

  /** Benford's-law correlation — feature_extractors.py:306.
    * First significant digit counts (+1 smoothing from the appended
    * 1..9 range) Pearson-correlated with the Benford distribution.
    * Correlation is shift-invariant so the −1 in the reference is a
    * no-op; expanded algebraically over the 9 fixed digits. */
  def benfordCorrelation(p: Panel): DataFrame = {
    val benford = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val firstDigit = substring(regexp_replace(p.x.cast("string"), "^[-0.]+", ""), 1, 1)
    val cnts = (1 to 9).map(d =>
      (sum(when(p.x =!= 0 && firstDigit === d.toString, 1).otherwise(0)) + 1).cast("double"))
    val n = lit(9.0)
    val sumC = cnts.reduce(_ + _)
    val sumB = lit(benford.sum)
    val sumCB = cnts.zip(benford).map { case (c, b) => c * lit(b) }.reduce(_ + _)
    val sumC2 = cnts.map(c => c * c).reduce(_ + _)
    val sumB2 = lit(benford.map(b => b * b).sum)
    // try_divide: a degenerate entity (all values 0/null ⇒ uniform
    // digit counts) has zero count variance — ANSI double/0 would
    // kill the job; null correlation matches DuckDB's double/0 = NULL
    val corr = try_divide(n * sumCB - sumC * sumB,
      sqrt(n * sumC2 - sumC * sumC) * sqrt(n * sumB2 - sumB * sumB))
    p.agg(corr.as("benford_correlation"))
  }

  /** mean |Δx| restricted to the [ql,qh] quantile corridor —
    * feature_extractors.py:440 (scalarized: the reference returns the
    * raw diff list; we expose mean-of-abs like tsfresh's aggregation). */
  def changeQuantilesMean(p: Panel, ql: Double, qh: Double): DataFrame = {
    val d = p.df
      .withColumn("__ql", percentile(p.x, lit(ql)).over(p.we))
      .withColumn("__qh", percentile(p.x, lit(qh)).over(p.we))
      .withColumn("__in", p.x >= col("__ql") && p.x <= col("__qh"))
      .withColumn("__pin", lag(col("__in"), 1).over(p.w))
      .withColumn("__d", p.x - lag(p.x, 1).over(p.w))
    Panel(d, p.entity, p.order, p.value).agg(
      avg(when(col("__in") && col("__pin"), abs(col("__d")))).as("change_quantiles_mean"))
  }

  /** run-length stats of streaks where Δx≥t (above) or ≤t —
    * feature_extractors.py:1752: {min,max,mean,std,p10,median,p90}
    * over run lengths (mode dropped: tie-breaking is engine-defined;
    * exposed separately as deterministic smallest-modal-length). */
  def streakLengthStats(p: Panel, above: Boolean, t: Double): DataFrame = {
    val d0 = p.df.withColumn("__d", p.x - lag(p.x, 1).over(p.w))
    val cond = (if (above) col("__d") >= t else col("__d") <= t) && col("__d").isNotNull
    val d = d0
      .withColumn("__c", cond)
      .withColumn("__flip", when(col("__c") <=> lag(col("__c"), 1).over(p.w), 0).otherwise(1))
      .withColumn("__rid", sum(col("__flip")).over(p.w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = d.filter(col("__c"))
      .groupBy((p.entityCols :+ col("__rid")): _*).agg(count(lit(1)).as("len"))
    val stats = runs.groupBy(p.entityCols: _*).agg(
      min(col("len")).as("min_len"),
      max(col("len")).as("max_len"),
      avg(col("len")).as("mean_len"),
      stddev_samp(col("len")).as("std_len"),
      percentile(col("len"), lit(0.1)).as("p10_len"),
      percentile(col("len"), lit(0.5)).as("median_len"),
      percentile(col("len"), lit(0.9)).as("p90_len"))
    // zero-run entities keep a row with null stats (the reference's
    // empty-aggregation result), like the longestRun helper — a bare
    // group-over-runs would silently drop them from the output
    p.df.select(p.entityCols: _*).distinct().join(stats, p.entity, "left")
  }

  /** permutation entropy, embedding dim 3, τ=1 —
    * feature_extractors.py:1315: entropy of ordinal-pattern counts.
    * Pattern = stable-argsort rank triple of (x_t, x_{t+1}, x_{t+2}). */
  def permutationEntropy3(p: Panel): DataFrame = {
    val a = p.x
    val b = lead(p.x, 1).over(p.w)
    val c = lead(p.x, 2).over(p.w)
    def rank(self: Column, o1: Column, o2: Column, tieBefore: Column*) = {
      val less = when(o1 < self, 1).otherwise(0) + when(o2 < self, 1).otherwise(0)
      val ties = tieBefore.map(t => when(t === self, 1).otherwise(0))
        .foldLeft(lit(0))(_ + _)
      less + ties
    }
    val d = p.df
      .withColumn("__b", b).withColumn("__c", c)
      .filter(col("__b").isNotNull && col("__c").isNotNull)
      .withColumn("__pat", concat_ws("",
        rank(a, col("__b"), col("__c")),
        rank(col("__b"), a, col("__c"), a),
        rank(col("__c"), a, col("__b"), a, col("__b"))))
    val counts = d.groupBy((p.entityCols :+ col("__pat")): _*).agg(count(lit(1)).as("__c2"))
    entropyOfCounts(counts, p.entity, "__c2", "permutation_entropy")
  }
}

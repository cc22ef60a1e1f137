package graft.queries

import graft.functions.Features
import org.apache.spark.sql.functions._
import Q._

/** SparkEntry registrations for the SQL-composable feature extractors
  * (SURVEY.md §2.3), each run as groupBy(user_id) over the events
  * panel with a DuckDB oracle on the same parquet. */
object FeatureQueries {

  private val benford = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** DuckDB Pearson-corr-with-Benford, expanded over the 9 digit counts
    * exactly like [[Features.benfordCorrelation]]. */
  private def benfordOracle: String = {
    val cnt = (1 to 9).map(d =>
      s"(sum(CASE WHEN value <> 0 AND substr(regexp_replace(CAST(value AS VARCHAR), '^[-0.]+', ''), 1, 1) = '$d' THEN 1 ELSE 0 END) + 1)::DOUBLE").toArray
    val sumC = cnt.mkString("(", " + ", ")")
    val sumCB = cnt.zip(benford).map { case (c, b) => s"$c * $b" }.mkString("(", " + ", ")")
    val sumC2 = cnt.map(c => s"$c * $c").mkString("(", " + ", ")")
    val sumB = benford.sum
    val sumB2 = benford.map(b => b * b).sum
    s"""SELECT user_id,
        round((9.0 * $sumCB - $sumC * $sumB) /
              (sqrt(9.0 * $sumC2 - $sumC * $sumC) * sqrt(9.0 * $sumB2 - $sumB * $sumB)), 6)
          AS benford_correlation
        FROM events GROUP BY user_id"""
  }

  val all: Map[String, Q] = Map(
    "f_absolute_energy" -> Q(
      "SELECT user_id, round(sum(value*value),6) AS absolute_energy FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.absoluteEnergy(col("value")).as("absolute_energy")))
    },

    "f_absolute_maximum" -> Q(
      "SELECT user_id, round(greatest(abs(min(value)),abs(max(value))),6) AS absolute_maximum FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.absoluteMaximum(col("value")).as("absolute_maximum")))
    },

    "f_count_above" -> FuzzBuilders.countAbove(100.0),

    "f_count_below" -> FuzzBuilders.countBelow(100.0),

    "f_has_duplicate" -> Q(
      "SELECT user_id, count(value) > count(DISTINCT value) AS has_duplicate FROM events GROUP BY user_id") {
      (s, dir) => ev(s, dir).agg(Features.hasDuplicate(col("value")).as("has_duplicate"))
    },

    "f_large_standard_deviation" -> FuzzBuilders.largeStandardDeviation(0.25),

    "f_range_count" -> FuzzBuilders.rangeCount(50.0, 150.0),

    "f_ratio_n_unique_to_length" -> Q(
      "SELECT user_id, round(count(DISTINCT value)::DOUBLE/count(value),6) AS ratio_n_unique_to_length FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.ratioNUniqueToLength(col("value")).as("ratio_n_unique_to_length")))
    },

    "f_root_mean_square" -> Q(
      "SELECT user_id, round(sqrt(avg(value*value)),6) AS root_mean_square FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.rootMeanSquare(col("value")).as("root_mean_square")))
    },

    "f_symmetry_looking" -> FuzzBuilders.symmetryLooking(0.05),

    "f_variation_coefficient" -> Q(
      "SELECT user_id, round(stddev_pop(value)/avg(value),6) AS variation_coefficient FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.variationCoefficient(col("value")).as("variation_coefficient")))
    },

    "f_var_gt_std" -> Q(
      "SELECT user_id, var_samp(value) >= 1.0 AS var_gt_std FROM events GROUP BY user_id") {
      (s, dir) => ev(s, dir).agg(Features.varGtStd(col("value")).as("var_gt_std"))
    },

    "f_harmonic_mean" -> Q(
      // zero values follow the reference's 1/0 = inf ⇒ mean 0 (DuckDB
      // double/0 is NULL, so the inf branch is explicit on both sides)
      """SELECT user_id, round(count(value)::DOUBLE /
           sum(CASE WHEN value = 0.0 THEN 'infinity'::DOUBLE
                    ELSE CAST(1 AS DOUBLE)/value END),6) AS harmonic_mean
         FROM events GROUP BY user_id""") {
      (s, dir) => r6(ev(s, dir).agg(Features.harmonicMean(col("value")).as("harmonic_mean")))
    },

    "f_range_over_mean" -> Q(
      "SELECT user_id, round((max(value)-min(value))/avg(value),6) AS range_over_mean FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.rangeOverMean(col("value")).as("range_over_mean")))
    },

    "f_range_change" -> Q(
      "SELECT user_id, round(max(value)/min(value) - CAST(1 AS DOUBLE),6) AS range_change FROM events GROUP BY user_id") {
      (s, dir) => r6(ev(s, dir).agg(Features.rangeChange(col("value"), percentage = true).as("range_change")))
    },

    "f_mean_n_absolute_max" -> FuzzBuilders.meanNAbsoluteMax(3),

    "f_absolute_sum_of_changes" -> Q(
      s"""SELECT user_id, round(sum(abs(d)),6) AS absolute_sum_of_changes FROM (
            SELECT user_id, value - lag(value) OVER ($W) AS d FROM events) GROUP BY user_id""") {
      (s, dir) => r6(Features.absoluteSumOfChanges(ev(s, dir)))
    },

    "f_mean_abs_change" -> Q(
      s"""SELECT user_id, round(avg(abs(d)),6) AS mean_abs_change FROM (
            SELECT user_id, value - lag(value) OVER ($W) AS d FROM events) GROUP BY user_id""") {
      (s, dir) => r6(Features.meanAbsChange(ev(s, dir)))
    },

    "f_max_abs_change" -> Q(
      s"""SELECT user_id, round(max(abs(d)),6) AS max_abs_change FROM (
            SELECT user_id, value - lag(value) OVER ($W) AS d FROM events) GROUP BY user_id""") {
      (s, dir) => r6(Features.maxAbsChange(ev(s, dir)))
    },

    "f_mean_change" -> Q(
      s"""SELECT user_id,
            round(CASE WHEN count(*) > 1
                  THEN (arg_max(value, ts) - arg_min(value, ts)) / (count(*) - 1)
                  ELSE CAST(0 AS DOUBLE) END, 6) AS mean_change
          FROM events GROUP BY user_id""") {
      (s, dir) => r6(Features.meanChange(ev(s, dir)))
    },

    "f_mean_second_derivative_central" -> Q(
      s"""WITH r AS (SELECT user_id, value, row_number() OVER ($W) AS rn,
                            count(*) OVER ($WE) AS cnt FROM events)
          SELECT user_id,
            round(CASE WHEN max(cnt) < 3 THEN CAST('NaN' AS DOUBLE)
                  ELSE (max(CASE WHEN rn = cnt THEN value END)
                      - max(CASE WHEN rn = cnt-1 THEN value END)
                      - max(CASE WHEN rn = 2 THEN value END)
                      + max(CASE WHEN rn = 1 THEN value END))
                      / (CAST(2 AS DOUBLE) * (max(cnt) - 2)) END, 6)
              AS mean_second_derivative_central
          FROM r GROUP BY user_id""") {
      (s, dir) => r6(Features.meanSecondDerivativeCentral(ev(s, dir)))
    },

    "f_autocorrelation" -> FuzzBuilders.autocorrelation(1),

    "f_c3" -> FuzzBuilders.c3(1),

    "f_cid_ce" -> FuzzBuilders.cidCe(normalize = true),

    "f_count_above_mean" -> Q(
      s"""WITH b AS (SELECT user_id, value, avg(value) OVER ($WE) AS mu FROM events)
          SELECT user_id, CAST(sum(CASE WHEN value > mu THEN 1 ELSE 0 END) AS BIGINT) AS count_above_mean
          FROM b GROUP BY user_id""") {
      (s, dir) => Features.countAboveMean(ev(s, dir))
    },

    "f_count_below_mean" -> Q(
      s"""WITH b AS (SELECT user_id, value, avg(value) OVER ($WE) AS mu FROM events)
          SELECT user_id, CAST(sum(CASE WHEN value < mu THEN 1 ELSE 0 END) AS BIGINT) AS count_below_mean
          FROM b GROUP BY user_id""") {
      (s, dir) => Features.countBelowMean(ev(s, dir))
    },

    "f_first_location_of_maximum" -> Q(
      s"""WITH b AS (SELECT user_id, value, row_number() OVER ($W) - 1 AS rn,
                            max(value) OVER ($WE) AS mx FROM events)
          SELECT user_id, round(min(CASE WHEN value = mx THEN rn END)::DOUBLE / count(value),6)
            AS first_location_of_maximum
          FROM b GROUP BY user_id""") {
      (s, dir) => r6(Features.firstLocationOfMaximum(ev(s, dir)))
    },

    "f_first_location_of_minimum" -> Q(
      s"""WITH b AS (SELECT user_id, value, row_number() OVER ($W) - 1 AS rn,
                            min(value) OVER ($WE) AS mn FROM events)
          SELECT user_id, round(min(CASE WHEN value = mn THEN rn END)::DOUBLE / count(value),6)
            AS first_location_of_minimum
          FROM b GROUP BY user_id""") {
      (s, dir) => r6(Features.firstLocationOfMinimum(ev(s, dir)))
    },

    "f_last_location_of_maximum" -> Q(
      s"""WITH b AS (SELECT user_id, value, row_number() OVER ($W) - 1 AS rn,
                            max(value) OVER ($WE) AS mx FROM events)
          SELECT user_id, round((max(CASE WHEN value = mx THEN rn END) + 1)::DOUBLE / count(value),6)
            AS last_location_of_maximum
          FROM b GROUP BY user_id""") {
      (s, dir) => r6(Features.lastLocationOfMaximum(ev(s, dir)))
    },

    "f_last_location_of_minimum" -> Q(
      s"""WITH b AS (SELECT user_id, value, row_number() OVER ($W) - 1 AS rn,
                            min(value) OVER ($WE) AS mn FROM events)
          SELECT user_id, round((max(CASE WHEN value = mn THEN rn END) + 1)::DOUBLE / count(value),6)
            AS last_location_of_minimum
          FROM b GROUP BY user_id""") {
      (s, dir) => r6(Features.lastLocationOfMinimum(ev(s, dir)))
    },

    "f_has_duplicate_max" -> Q(
      s"""WITH b AS (SELECT user_id, value, max(value) OVER ($WE) AS mx FROM events)
          SELECT user_id, sum(CASE WHEN value = mx THEN 1 ELSE 0 END) > 1 AS has_duplicate_max
          FROM b GROUP BY user_id""") {
      (s, dir) => Features.hasDuplicateMax(ev(s, dir))
    },

    "f_has_duplicate_min" -> Q(
      s"""WITH b AS (SELECT user_id, value, min(value) OVER ($WE) AS mn FROM events)
          SELECT user_id, sum(CASE WHEN value = mn THEN 1 ELSE 0 END) > 1 AS has_duplicate_min
          FROM b GROUP BY user_id""") {
      (s, dir) => Features.hasDuplicateMin(ev(s, dir))
    },

    "f_index_mass_quantile" -> FuzzBuilders.indexMassQuantile(0.5),

    "f_linear_trend" -> Q(
      s"""WITH b AS (SELECT user_id, value, (row_number() OVER ($W) - 1)::DOUBLE AS i FROM events)
          SELECT user_id,
            round(covar_samp(value, i)/var_samp(i),6) AS slope,
            round(avg(value) - covar_samp(value, i)/var_samp(i)*avg(i),6) AS intercept,
            round((count(*)-1) * (var_samp(value) - pow(covar_samp(value, i)/var_samp(i), 2)*var_samp(i)),6) AS rss
          FROM b GROUP BY user_id""") {
      (s, dir) => r6(Features.linearTrend(ev(s, dir)))
    },

    "f_longest_streak_above_mean" -> Q(longestStreakMeanOracle(above = true, "longest_streak_above_mean")) {
      (s, dir) => Features.longestStreakAboveMean(ev(s, dir))
    },

    "f_longest_streak_below_mean" -> Q(longestStreakMeanOracle(above = false, "longest_streak_below_mean")) {
      (s, dir) => Features.longestStreakBelowMean(ev(s, dir))
    },

    "f_longest_winning_streak" -> FuzzBuilders.longestDiffStreak(above = true, 0.0),

    "f_longest_losing_streak" -> FuzzBuilders.longestDiffStreak(above = false, 0.0),

    "f_number_crossings" -> FuzzBuilders.numberCrossings(100.0),

    "f_number_peaks" -> FuzzBuilders.numberPeaks(2),

    "f_percent_reoccurring_points" -> Q(
      s"""WITH vc AS (SELECT user_id, value, count(*) AS c FROM events GROUP BY user_id, value)
          SELECT user_id, round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c),6)
            AS percent_reoccurring_points
          FROM vc GROUP BY user_id""") {
      (s, dir) => r6(Features.percentReoccurringPoints(ev(s, dir)))
    },

    "f_percent_reoccurring_values" -> Q(
      s"""WITH vc AS (SELECT user_id, value, count(*) AS c FROM events GROUP BY user_id, value)
          SELECT user_id, round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*),6)
            AS percent_reoccurring_values
          FROM vc GROUP BY user_id""") {
      (s, dir) => r6(Features.percentReoccurringValues(ev(s, dir)))
    },

    "f_sum_reoccurring_points" -> Q(
      s"""WITH vc AS (SELECT user_id, value, count(*) AS c FROM events GROUP BY user_id, value)
          SELECT user_id, round(sum(CASE WHEN c > 1 THEN value * c ELSE CAST(0 AS DOUBLE) END),6)
            AS sum_reoccurring_points
          FROM vc GROUP BY user_id""") {
      (s, dir) => r6(Features.sumReoccurringPoints(ev(s, dir)))
    },

    "f_sum_reoccurring_values" -> Q(
      s"""WITH vc AS (SELECT user_id, value, count(*) AS c FROM events GROUP BY user_id, value)
          SELECT user_id, round(sum(CASE WHEN c > 1 THEN value ELSE CAST(0 AS DOUBLE) END),6)
            AS sum_reoccurring_values
          FROM vc GROUP BY user_id""") {
      (s, dir) => r6(Features.sumReoccurringValues(ev(s, dir)))
    },

    "f_ratio_beyond_r_sigma" -> FuzzBuilders.ratioBeyondRSigma(1.0),

    "f_time_reversal_asymmetry_statistic" -> FuzzBuilders.timeReversalAsymmetryStatistic(1),

    "f_energy_ratios" -> FuzzBuilders.energyRatios(3),

    "f_binned_entropy" -> FuzzBuilders.binnedEntropy(10),

    "f_benford_correlation" -> Q(benfordOracle) {
      (s, dir) => r6(Features.benfordCorrelation(ev(s, dir)))
    },

    "f_permutation_entropy" -> Q(
      s"""WITH v AS (SELECT user_id, value AS a,
                            lead(value, 1) OVER ($W) AS b,
                            lead(value, 2) OVER ($W) AS c FROM events),
               pat AS (SELECT user_id,
                 CAST(CASE WHEN b < a THEN 1 ELSE 0 END + CASE WHEN c < a THEN 1 ELSE 0 END AS VARCHAR) ||
                 CAST(CASE WHEN a < b THEN 1 ELSE 0 END + CASE WHEN c < b THEN 1 ELSE 0 END + CASE WHEN a = b THEN 1 ELSE 0 END AS VARCHAR) ||
                 CAST(CASE WHEN a < c THEN 1 ELSE 0 END + CASE WHEN b < c THEN 1 ELSE 0 END + CASE WHEN a = c THEN 1 ELSE 0 END + CASE WHEN b = c THEN 1 ELSE 0 END AS VARCHAR)
                   AS pattern
                 FROM v WHERE b IS NOT NULL AND c IS NOT NULL),
               cnt AS (SELECT user_id, pattern, count(*) AS c FROM pat GROUP BY user_id, pattern),
               p AS (SELECT user_id, c::DOUBLE / sum(c) OVER (PARTITION BY user_id) AS p FROM cnt)
          SELECT user_id, round(-sum(p * ln(p)),6) AS permutation_entropy FROM p GROUP BY user_id""") {
      (s, dir) => r6(Features.permutationEntropy3(ev(s, dir)))
    },

    "f_change_quantiles" -> FuzzBuilders.changeQuantilesMean(0.1, 0.9),

    "f_streak_length_stats" -> FuzzBuilders.streakLengthStats(above = true, 0.0)
  )

  private def longestStreakMeanOracle(above: Boolean, name: String): String = {
    val cmp = if (above) ">" else "<"
    s"""WITH b AS (SELECT user_id, ts, event_id, value $cmp avg(value) OVER ($WE) AS c FROM events),
            f AS (SELECT user_id, ts, event_id, c,
                         CASE WHEN c IS NOT DISTINCT FROM lag(c) OVER ($W) THEN 0 ELSE 1 END AS flip
                  FROM b),
            r AS (SELECT user_id, c, sum(flip) OVER ($W ROWS UNBOUNDED PRECEDING) AS rid FROM f),
            runs AS (SELECT user_id, rid, count(*) AS len FROM r WHERE c GROUP BY user_id, rid),
            m AS (SELECT user_id, max(len) AS $name FROM runs GROUP BY user_id)
        SELECT u.user_id, CAST(coalesce(m.$name, 0) AS BIGINT) AS $name
        FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN m ON u.user_id = m.user_id"""
  }

  private def longestDiffStreakOracle(cond: String, name: String): String =
    s"""WITH d AS (SELECT user_id, ts, event_id, value - lag(value) OVER ($W) AS d FROM events),
            c AS (SELECT user_id, ts, event_id, d IS NOT NULL AND d $cond AS c FROM d),
            f AS (SELECT user_id, ts, event_id, c,
                         CASE WHEN c IS NOT DISTINCT FROM lag(c) OVER ($W) THEN 0 ELSE 1 END AS flip
                  FROM c),
            r AS (SELECT user_id, c, sum(flip) OVER ($W ROWS UNBOUNDED PRECEDING) AS rid FROM f),
            runs AS (SELECT user_id, rid, count(*) AS len FROM r WHERE c GROUP BY user_id, rid),
            m AS (SELECT user_id, max(len) AS $name FROM runs GROUP BY user_id)
        SELECT u.user_id, CAST(coalesce(m.$name, 0) AS BIGINT) AS $name
        FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN m ON u.user_id = m.user_id"""
}

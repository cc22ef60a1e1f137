package graft

import graft.functions.Features
import org.apache.spark.sql.functions._

/** Golden-value tests: literals from the reference's tsfresh suite
  * (reference: tests/test_tsfresh.py — cited per case). */
class FeaturesSpec extends SparkSpec {

  test("absolute_energy (test_tsfresh.py:386-393)") {
    // ([-5,0,1],[26]), ([-1,2,-3],[14]), ([-1.0,1.3],[2.69])
    assertClose(featVal(panel(Seq(-5, 0, 1)).agg(Features.absoluteEnergy(col("value")).as("f")), "f"), 26.0)
    assertClose(featVal(panel(Seq(-1, 2, -3)).agg(Features.absoluteEnergy(col("value")).as("f")), "f"), 14.0)
    assertClose(featVal(panel(Seq(-1.0, 1.3)).agg(Features.absoluteEnergy(col("value")).as("f")), "f"), 2.69)
  }

  test("absolute_maximum (test_tsfresh.py:407-414)") {
    assertClose(featVal(panel(Seq(-5, 0, 1)).agg(Features.absoluteMaximum(col("value")).as("f")), "f"), 5.0)
    assertClose(featVal(panel(Seq(-1.0, 2.0, -3.0)).agg(Features.absoluteMaximum(col("value")).as("f")), "f"), 3.0)
  }

  test("absolute_sum_of_changes (test_tsfresh.py:428-430)") {
    assertClose(featVal(Features.absoluteSumOfChanges(panel(Seq(1, 1, 1, 1, 2, 1))), "absolute_sum_of_changes"), 2.0)
    assertClose(featVal(Features.absoluteSumOfChanges(panel(Seq(1.4, -1.3, 1.7, -1.2))), "absolute_sum_of_changes"), 8.6)
  }

  test("mean_abs_change (test_tsfresh.py:166-178)") {
    assertClose(featVal(Features.meanAbsChange(panel(Seq(0, 1, 2))), "mean_abs_change"), 1.0)
    assertClose(featVal(Features.meanAbsChange(panel(Seq(0.0, 1.5, 2, 2.5))), "mean_abs_change"), 5.0 / 6)
    assertClose(featVal(Features.meanAbsChange(panel(Seq(-1, 2, 3, 4))), "mean_abs_change"), 5.0 / 3)
  }

  test("c3 (test_tsfresh.py:540-547)") {
    assertClose(featVal(Features.c3(panel(Seq(1, 2, -3, 4)), 1), "c3"), -15.0)
    assertClose(featVal(Features.c3(panel(Seq.fill(10)(1.0)), 1), "c3"), 1.0)
    assertClose(featVal(Features.c3(panel(Seq.fill(10)(1.0)), 2), "c3"), 1.0)
  }

  test("linear_trend (test_tsfresh.py:330-350)") {
    val lt1 = Features.linearTrend(panel(Seq(1, 2, 3, 4, 5)))
    assertClose(featVal(lt1, "slope"), 1.0); assertClose(featVal(lt1, "intercept"), 1.0)
    assertClose(featVal(lt1, "rss"), 0.0)
    val lt2 = Features.linearTrend(panel(Seq(-1, -2, -3, -4, -5)))
    assertClose(featVal(lt2, "slope"), -1.0); assertClose(featVal(lt2, "intercept"), -1.0)
    val lt3 = Features.linearTrend(panel((0 until 51).map(i => 2.0 + 2.0 * i)))
    assertClose(featVal(lt3, "slope"), 2.0); assertClose(featVal(lt3, "intercept"), 2.0)
    assertClose(featVal(lt3, "rss"), 0.0, 1e-7)
  }

  test("streak_length_stats above 0 (test_tsfresh.py:100-112)") {
    // [0,1,1,0,2,2,2] → runs of diff>=0: min 2, max 3, mean 2.5, std .707107, p10 2, median 2.5, p90 3
    val d = Features.streakLengthStats(panel(Seq(0, 1, 1, 0, 2, 2, 2)), above = true, 0.0)
    assertClose(featVal(d, "min_len"), 2.0); assertClose(featVal(d, "max_len"), 3.0)
    assertClose(featVal(d, "mean_len"), 2.5); assertClose(featVal(d, "std_len"), 0.707107, 1e-5)
    assertClose(featVal(d, "p10_len"), 2.0, 0.11) // interpolation convention differs slightly
    assertClose(featVal(d, "median_len"), 2.5); assertClose(featVal(d, "p90_len"), 3.0, 0.11)
  }

  test("mean_change (test_tsfresh.py semantics: (last-first)/(n-1))") {
    assertClose(featVal(Features.meanChange(panel(Seq(1.0, 3.0, 7.0))), "mean_change"), 3.0)
    assertClose(featVal(Features.meanChange(panel(Seq(5.0))), "mean_change"), 0.0)
  }

  test("number_peaks (feature_extractors.py:1276 semantics)") {
    // tsfresh doc example: x=[3,0,0,4,0,0,13], n=2 → 1 peak (the 4)
    assertClose(featVal(Features.numberPeaks(panel(Seq(3, 0, 0, 4, 0, 0, 13)), 2), "number_peaks"), 1.0)
  }

  test("longest streaks") {
    assertClose(featVal(Features.longestStreakAboveMean(panel(Seq(1, 1, 5, 5, 5, 1))), "longest_streak_above_mean"), 3.0)
    assertClose(featVal(Features.longestStreakBelowMean(panel(Seq(5, 5, 1, 5, 5, 5))), "longest_streak_below_mean"), 1.0)
    // all-above-threshold never true → 0 (null-handling path)
    assertClose(featVal(Features.longestStreakAbove(panel(Seq(5.0, 4.0, 3.0)), 10.0), "longest_streak_above"), 0.0)
  }

  test("autocorrelation lag 1 matches formula") {
    // constant series: var_pop=0 → null/NaN; linear: known value
    val s = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val mu = 3.0; val varp = 2.0
    val expected = (1 to 4).map(i => (s(i - 1) - mu) * (s(i) - mu)).sum / (varp * 4)
    assertClose(featVal(Features.autocorrelation(panel(s), 1), "autocorrelation"), expected)
  }

  test("index_mass_quantile q=0.5 (tsfresh: abs mass center)") {
    // [1,1,1,1] → cum=1,2,3,4; target=2; first idx(0-based)=1 → (1+1)/4 = 0.5
    assertClose(featVal(Features.indexMassQuantile(panel(Seq(1, 1, 1, 1)), 0.5), "index_mass_quantile"), 0.5)
  }

  test("binned_entropy (test_tsfresh.py binned cases)") {
    // 10 identical values, k bins → single bin → entropy 0
    assertClose(featVal(Features.binnedEntropy(panel(Seq.fill(10)(7.0)), 10), "binned_entropy"), 0.0)
    // uniform 0..9 with 10 bins → -ln(1/10)
    assertClose(featVal(Features.binnedEntropy(panel((0 until 10).map(_.toDouble)), 10), "binned_entropy"), math.log(10), 1e-6)
  }

  test("permutation_entropy d=3 on monotone series is 0") {
    assertClose(featVal(Features.permutationEntropy3(panel((1 to 10).map(_.toDouble))), "permutation_entropy"), 0.0)
  }

  test("benford_correlation perfect benford sample is ~1") {
    // counts proportional to benford distribution: digit d appears round(1000*log10(1+1/d)) times
    val s = (1 to 9).flatMap(d => Seq.fill(math.round(1000 * math.log10(1 + 1.0 / d)).toInt)(d * 1.0 + 0.01))
    val v = featVal(Features.benfordCorrelation(panel(s)), "benford_correlation")
    assert(v > 0.999, s"got $v")
  }
}

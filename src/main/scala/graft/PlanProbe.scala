package graft

import graft.core.Panel
import graft.operators.{CrossValidation, Preprocess, PrefixBacktest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc physical-plan probe for the prefix-shared backtest: counts
  * Exchange operators in one transform member's split plan — the
  * shuffle-accounting tool behind the SCALE.md "zero full-width
  * shuffles" claim. Usage: runMain graft.PlanProbe */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = for (e <- 0 until 100; t <- 0 until 40)
      yield (e, t, 5.0 + 0.1 * t + math.sin(t / 3.0) + e % 7)
    val p = Panel(rows.toDF("entity", "t", "value"), Seq("entity"), Seq("t"), "value")
    val lags = 4
    val sharedLag = CrossValidation
      .withPosition(p.copy(df = Preprocess.lagKeepAll(p, 1 to lags))).cache()
    sharedLag.count()
    val bt = PrefixBacktest.backtest(p, "t", lags, 5, 2, 5, sharedLag,
      PrefixBacktest.ScaleT,
      (df, fs, lb) => graft.functions.Ols.fit(df, fs, lb, ridge = 0.1))
    val plan = bt.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"[plan-probe] Exchange nodes in ScaleT backtest plan: $nEx")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate"))
      .take(40).mkString("\n"))
    // fourier prefix-share invariant (r12): a fourier member's split
    // plan must read the CACHED shared lag frame — fourier features
    // are position expressions over __rn, so the plan may contain no
    // lag Window over the raw panel (the per-split rebuild shape the
    // prefix rewrite removed)
    val btF = PrefixBacktest.backtestFourier(p, "t", lags, 7, 2, 5, 2, 5,
      sharedLag, PrefixBacktest.ScaleT,
      (df, fs, lb) => graft.functions.Ols.fit(df, fs, lb, ridge = 0.1))
    // tree-walk, not text: InMemoryRelation is a LEAF of the logical
    // plan, so `collect` counts only Windows the query would EXECUTE —
    // the cached shared-lag build plan (which legitimately holds the
    // one-time lag/position Windows) prints inside the leaf's text but
    // is never re-run
    val opt = btF.queryExecution.optimizedPlan
    val nWin = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    val nScan = opt.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryRelation => s
    }.size
    println(s"[plan-probe] fourier backtest optimized plan: Window nodes = " +
      s"$nWin (expect 0 — no per-split lag rebuild), cached shared-lag " +
      s"reads = $nScan")
    require(nWin == 0, s"fourier prefix backtest re-built lags per split " +
      s"($nWin executable Window nodes in the optimized plan)")
    require(nScan > 0, "fourier prefix backtest did not read the cached " +
      "shared lag frame")
    spark.stop()
  }
}

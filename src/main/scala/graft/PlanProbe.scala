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
    spark.stop()
  }
}

package graft.operators

import graft.core.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AutoML-style model selection and the elite ensemble.
  *
  * Reference: forecasting/_ar.py:117-209 (`fit_cv` lag sweep over
  * expanding-window CV; FLAML's hyperparameter search is reduced to
  * the lag/regularization grid — the FLAML engine itself is out of
  * scope per SURVEY.md §2.5) and forecasting/elite.py:25-387
  * (backtest a pool of base forecasters, rank per entity, blend the
  * per-entity top-k, fall back to naive where naive wins CV).
  *
  * Scale design: every candidate evaluation is an independent
  * backtest over the same cached panel — candidates are scored
  * sequentially on the driver but each scoring is a distributed job;
  * the per-entity ranking/blending is joins + window ranks (one
  * shuffle on entity), never a driver-side loop over entities.
  */
object AutoForecast {

  /** Mean per-entity SMAPE of a backtest frame (lower = better). */
  private def backtestScore(bt: DataFrame, entity: Seq[String]): DataFrame =
    bt.groupBy(entity.map(col): _*)
      .agg((sum(abs(col("pred") - col("actual"))) / sum(col("pred") + col("actual")))
        .as("smape"))

  /** Lag sweep with expanding-window CV — _ar.py:117-209: backtest the
    * linear forecaster per candidate lag count, pick the lag grid
    * point with the lowest mean SMAPE, refit on all data. */
  def autoLinear(p: Panel, timeCol: String, freq: String, lagGrid: Seq[Int],
                 testSize: Int = 10, nSplits: Int = 3, stepSize: Int = 5)
      : (Int, Double, LinearForecasterModel) = {
    val cached = p.copy(df = p.df.cache())
    val scored = lagGrid.map { lags =>
      val bt = Conformal.backtest(cached, timeCol, testSize, nSplits, stepSize,
        (train, fh) => LinearForecaster.fit(train, lags, freq).predict(train, timeCol, fh))
      val mean = backtestScore(bt, p.entity).agg(avg("smape")).collect()(0).getDouble(0)
      (lags, mean)
    }
    val (bestLags, bestScore) = scored.minBy(_._2)
    (bestLags, bestScore, LinearForecaster.fit(cached, bestLags, freq))
  }

  /** Elite ensemble — elite.py: backtest each named base forecaster,
    * rank per entity by mean CV SMAPE, average the predictions of the
    * per-entity top-k models (mean stacking, elite.py:303-308), with
    * the naive fallback built in (when naive ranks top-k it simply
    * participates; when it wins outright it dominates the blend). */
  def elite(p: Panel, timeCol: String, freq: String, fh: Int, topK: Int = 2,
            testSize: Int = 10, nSplits: Int = 3, stepSize: Int = 5): DataFrame = {
    val cached = p.copy(df = p.df.cache())
    val base: Seq[(String, (Panel, Int) => DataFrame)] = Seq(
      "naive" -> ((tr, h) => Forecasters.naive(tr, timeCol, h, freq)),
      "snaive" -> ((tr, h) => Forecasters.snaive(tr, timeCol, h, sp = 7, freq = freq)),
      "linear_7" -> ((tr, h) => LinearForecaster.fit(tr, 7, freq).predict(tr, timeCol, h)),
      "linear_14" -> ((tr, h) => LinearForecaster.fit(tr, 14, freq).predict(tr, timeCol, h)))
    // per-(entity, model) CV score
    val scores = base.map { case (name, f) =>
      backtestScore(Conformal.backtest(cached, timeCol, testSize, nSplits, stepSize, f), p.entity)
        .withColumn("model", lit(name))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(p.entityCols: _*).orderBy(col("smape").asc_nulls_last)
    val winners = scores.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select((p.entityCols :+ col("model")): _*)
    // full-data predictions per model, filtered to each entity's top-k
    val preds = base.map { case (name, f) =>
      f(cached, fh).withColumn("model", lit(name))
    }.reduce(_ unionByName _)
    preds.join(winners, p.entity :+ "model")
      .groupBy((p.entityCols :+ col(timeCol)): _*)
      .agg(avg(col(p.value)).as(p.value))
  }
}
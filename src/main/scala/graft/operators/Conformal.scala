package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conformal prediction intervals (ENBPI) and backtest residuals.
  *
  * Reference semantics: functime/conformal.py:6-74 (enbpi = per-entity
  * residual quantile added to the point forecast, one band per alpha;
  * conformalize = enbpi over backtest+final predictions with alpha
  * rescaled to base-100) and functime/backtesting.py:24-64 (residuals
  * = in-sample actual − predicted per CV split).
  *
  * Scale design: residual quantiles are a per-entity aggregate
  * (single shuffle on entity, map-side partial percentile); the join
  * back onto predictions broadcasts when the entity dimension is
  * small. Quantiles use linear interpolation (Spark `percentile`),
  * matching DuckDB `quantile_cont` for the oracle.
  */
object Conformal {

  /** Per-entity residual quantile per alpha, added to point
    * predictions. Output: (entity, time, value + score, quantile).
    * One band per alpha, stacked vertically — a single quantile
    * aggregation computes every alpha (array percentile), then one
    * explode fans out the bands; the prediction frame is scanned once.
    */
  def enbpi(yPred: DataFrame, yResid: DataFrame, entity: Seq[String],
            timeCol: String, predCol: String, residCol: String,
            alphas: Seq[Double]): DataFrame = {
    val scores = yResid.groupBy(entity.map(col): _*)
      .agg(percentile(col(residCol), typedLit(alphas)).as("__scores"))
      .select(entity.map(col) :+
        posexplode(col("__scores")).as(Seq("__ai", "__score")): _*)
      .withColumn("quantile", element_at(typedLit(alphas), col("__ai") + 1))
      .drop("__ai")
    yPred.join(scores, entity, "left")
      .select(entity.map(col) ++ Seq(col(timeCol),
        (col(predCol) + col("__score")).as(predCol), col("quantile")): _*)
  }

  /** ENBPI over the union of backtest + final predictions, with the
    * alpha band id rescaled to an int percent (conformal.py:69-72). */
  def conformalize(yPred: DataFrame, yPredBacktest: DataFrame, yResid: DataFrame,
                   entity: Seq[String], timeCol: String, predCol: String,
                   residCol: String, alphas: Seq[Double] = Seq(0.1, 0.9)): DataFrame = {
    val preds = yPred.select(entity.map(col) ++ Seq(col(timeCol), col(predCol)): _*)
      .unionByName(yPredBacktest.select(entity.map(col) ++ Seq(col(timeCol), col(predCol)): _*))
    enbpi(preds, yResid, entity, timeCol, predCol, residCol, alphas)
      .withColumn("quantile", (col("quantile") * 100).cast("int"))
  }

  /** In-sample residuals (actual − predicted) for an aligned frame
    * produced by [[Metrics.aligned]]: (entity..., keys..., a, p). */
  def residuals(aligned: DataFrame, out: String = "residual"): DataFrame =
    aligned.withColumn(out, col("a") - col("p"))
}

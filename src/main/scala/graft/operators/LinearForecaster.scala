package graft.operators

import graft.core.Panel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame

/** Global linear AR forecaster (reference: functime/forecasting/linear.py
  * + base/forecaster.py fit/predict pipeline).
  *
  * fit: AR-reduction matrix (lags 1..L per entity) → MLlib
  * LinearRegression (elasticNetParam spans ridge/lasso/elastic-net,
  * matching the reference's linear/lasso/ridge/elastic_net family).
  *
  * predict: the fitted coefficients are tiny, so the recursive
  * multi-step loop broadcasts them and runs as unrolled column algebra
  * per entity — one Spark job for all fh steps
  * ([[Forecasters.predictRecursiveLinear]]), instead of the
  * reference's driver-side per-step loop (_ar.py:216-270).
  */
final case class LinearForecasterModel(
    intercept: Double, weights: Array[Double], lags: Int, freq: String) {
  def predict(p: Panel, timeCol: String, fh: Int): DataFrame =
    Forecasters.predictRecursiveLinear(p, timeCol, fh, freq, intercept, weights)
}

object LinearForecaster {

  def fit(p: Panel, lags: Int, freq: String,
          regParam: Double = 0.0, elasticNetParam: Double = 0.0): LinearForecasterModel = {
    val reduction = Forecasters.makeReduction(p, lags)
    val featureCols = (1 to lags).map(l => s"${p.value}__lag_$l").toArray
    if (elasticNetParam == 0.0) {
      // pure OLS and pure-L2 ridge are both one-pass closed-form
      // normal equations (graft.functions.Ols; ridge = λ on the
      // non-intercept diagonal, sklearn-Ridge semantics — the
      // reference's backend) — no VectorAssembler materialization, no
      // MLlib summary passes. Only L1/elastic-net needs the iterative
      // solver below.
      val (b0, w) = graft.functions.Ols.fit(reduction, featureCols.toSeq, p.value,
        ridge = regParam)
      LinearForecasterModel(b0, w, lags, freq)
    } else {
      val assembled = new VectorAssembler()
        .setInputCols(featureCols).setOutputCol("__features")
        .transform(reduction.na.drop(featureCols :+ p.value))
      val lr = new LinearRegression()
        // L1 needs the iterative solver, so only pure-L2 takes the
        // closed-form normal path
        .setSolver(if (elasticNetParam == 0.0) "normal" else "auto")
        .setFeaturesCol("__features").setLabelCol(p.value)
        .setRegParam(regParam).setElasticNetParam(elasticNetParam)
      val m = lr.fit(assembled)
      LinearForecasterModel(m.intercept, m.coefficients.toArray, lags, freq)
    }
  }

  /** Direct multi-horizon strategy — _ar.py:53-73: one model per
    * horizon h, trained on the lag window shifted by h (features
    * y_{t−h}..y_{t−h−L+1} → label y_t). At predict time every model
    * scores the same per-entity tail [y_cutoff..y_{cutoff−L+1}], so
    * the whole fh-horizon prediction is broadcast column algebra —
    * one job, no recursion error compounding. */
  def fitDirect(p: Panel, lags: Int, fh: Int, freq: String): DirectLinearModel = {
    // one cached wide reduction; each horizon is a single closed-form
    // aggregation pass over its shifted lag window (per-horizon NA-drop
    // keeps the reference's per-model training rows)
    val reduction = Forecasters.makeReduction(p, lags + fh - 1).cache()
    val models = (1 to fh).map { h =>
      val featureCols = (h until h + lags).map(l => s"${p.value}__lag_$l")
      graft.functions.Ols.fit(reduction, featureCols, p.value)
    }
    reduction.unpersist(blocking = false)
    DirectLinearModel(models, lags, freq)
  }
}

/** One (intercept, weights-over-tail) pair per horizon step. */
final case class DirectLinearModel(
    models: Seq[(Double, Array[Double])], lags: Int, freq: String) {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  def predict(p: Panel, timeCol: String, fh: Int): DataFrame = {
    require(fh <= models.length, s"fitted for ${models.length} horizons")
    val tail = p.df
      .withColumn("__rn_desc", row_number().over(
        Window.partitionBy(p.entityCols: _*).orderBy(p.orderCols.map(_.desc): _*)))
      .filter(col("__rn_desc") <= lags)
    // entities with < lags observations are dropped (short __state
    // would make element_at throw under ANSI), mirroring the
    // reference's check_backtest_lengths
    val state0 = tail.groupBy(p.entityCols: _*).agg(
      collect_list(struct(col("__rn_desc"), p.x)).as("__s"),
      max(col(timeCol)).as("__cutoff"))
      .withColumn("__state", sort_array(col("__s")).getField(p.value))
      .filter(size(col("__state")) >= lags)
      .drop("__s")
    val preds = models.take(fh).map { case (b0, w) =>
      w.zipWithIndex.map { case (wc, i) => lit(wc) * element_at(col("__state"), i + 1) }
        .reduce(_ + _) + lit(b0)
    }
    state0.withColumn("__preds", array(preds: _*))
      .withColumn("__h", explode(sequence(lit(1), lit(fh))))
      .withColumn(p.value, element_at(col("__preds"), col("__h").cast("int")))
      .withColumn(timeCol, Forecasters.futureTime(freq))
      .select((p.entityCols ++ Seq(col(timeCol), col(p.value))): _*)
  }
}

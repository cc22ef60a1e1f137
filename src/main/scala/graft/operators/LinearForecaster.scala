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
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("__features")
      .transform(reduction.na.drop(featureCols :+ p.value))
    val lr = new LinearRegression()
      .setFeaturesCol("__features").setLabelCol(p.value)
      .setRegParam(regParam).setElasticNetParam(elasticNetParam)
    val m = lr.fit(assembled)
    LinearForecasterModel(m.intercept, m.coefficients.toArray, lags, freq)
  }
}

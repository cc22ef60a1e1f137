package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast metrics — per-entity scoring via left-join + groupBy(entity)
  * aggregation, mirroring the reference's `@metric` pattern
  * (reference: functime/metrics/point.py:10-18, base/metric.py:20-60).
  *
  * All metrics take aligned frames `yTrue(entity, time, actual)` and
  * `yPred(entity, time, pred)` and return one row per entity. The join
  * is an equi-join on (entity, time) — the reference's positional
  * alignment hazard (SURVEY.md §7.5(2)) is deliberately replaced by an
  * explicit key join. At scale both sides hash-partition on the join
  * key; per-entity scores then reuse that partitioning.
  */
object Metrics {

  /** Join y_true/y_pred on (entity ++ time) producing columns
    * `__a` (actual) and `__p` (pred).
    *
    * LEFT join: truth rows without a prediction survive with a null
    * `__p`, and the avg/sum-based metrics SKIP them — a forecaster
    * that covers only a fraction of the requested horizon is scored
    * on the rows it produced, with no built-in coverage penalty (the
    * reference's positional sort-zip behaves the same way). When
    * coverage matters, compare `count(__p IS NULL)` against the truth
    * row count before trusting a score. */
  def aligned(yTrue: DataFrame, yPred: DataFrame, keys: Seq[String],
              actual: String, pred: String): DataFrame =
    yTrue.withColumn("__a", col(actual).cast("double"))
      .select((keys.map(col) :+ col("__a")): _*)
      .join(
        yPred.withColumn("__p", col(pred).cast("double"))
          .select((keys.map(col) :+ col("__p")): _*),
        keys, "left")

  private def score(df: DataFrame, entity: Seq[String], expr: Column, name: String): DataFrame =
    df.groupBy(entity.map(col): _*).agg(expr.as(name))

  /** mean|p−a| — metrics/point.py:22 */
  def mae(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, avg(abs(col("__p") - col("__a"))), "mae")

  /** mean(p−a) (forecast bias) — metrics/point.py:42 */
  def mfe(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, avg(col("__p") - col("__a")), "mfe")

  /** mean|a−p|/|a| — metrics/point.py:62 */
  def mape(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, avg(try_divide(abs(col("__a") - col("__p")), abs(col("__a")))), "mape")

  /** mean(p−a)² — metrics/point.py:82 */
  def mse(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, avg(pow(col("__p") - col("__a"), 2)), "mse")

  /** √mse — metrics/point.py:102 */
  def rmse(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, sqrt(avg(pow(col("__p") - col("__a"), 2))), "rmse")

  /** Σ|p−a| / Σ(p+a) (3rd-form SMAPE) — metrics/point.py:122 */
  def smape(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, try_divide(sum(abs(col("__p") - col("__a"))), sum(col("__p") + col("__a"))), "smape")

  /** (100/n)·Σ 2|p−a|/(ε+|a|+|p|) — metrics/point.py:146 */
  def smapeOriginal(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity,
      avg(lit(200.0) * abs(col("__p") - col("__a"))
        / (lit(1e-15) + abs(col("__a")) + abs(col("__p")))), "smape_original")

  /** Σp where p>a — metrics/point.py:240 */
  def overforecast(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, sum(when(col("__p") > col("__a"), col("__p")).otherwise(0.0)), "overforecast")

  /** Σp where p<a — metrics/point.py:262 */
  def underforecast(j: DataFrame, entity: Seq[String]): DataFrame =
    score(j, entity, sum(when(col("__p") < col("__a"), col("__p")).otherwise(0.0)), "underforecast")

  /** mae ÷ in-sample seasonal-naive mae — metrics/point.py:168.
    * yTrain supplies the naive denominator (shift by sp per entity). */
  def mase(j: DataFrame, yTrain: DataFrame, entity: Seq[String],
           order: Seq[String], target: String, sp: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val naiveMae = yTrain
      .withColumn("__naive", lag(col(target), sp).over(w))
      .groupBy(entity.map(col): _*)
      .agg(avg(abs(col(target) - col("__naive"))).as("__den"))
    mae(j, entity).join(naiveMae, entity, "left")
      .select((entity.map(col) :+ try_divide(col("mae"), col("__den")).as("mase")): _*)
  }

  /** √(mse ÷ in-sample naive mse) — metrics/point.py:204 */
  def rmsse(j: DataFrame, yTrain: DataFrame, entity: Seq[String],
            order: Seq[String], target: String, sp: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val naiveMse = yTrain
      .withColumn("__naive", lag(col(target), sp).over(w))
      .groupBy(entity.map(col): _*)
      .agg(avg(pow(col(target) - col("__naive"), 2)).as("__den"))
    mse(j, entity).join(naiveMse, entity, "left")
      .select((entity.map(col) :+ sqrt(try_divide(col("mse"), col("__den"))).as("rmsse")): _*)
  }

  /** mean(lower ≤ a ≤ upper) — metrics/probabilistic.py:73 */
  def intervalCoverage(df: DataFrame, entity: Seq[String],
                       actual: String, lower: String, upper: String): DataFrame =
    df.groupBy(entity.map(col): _*)
      .agg(avg(when(col(actual).between(col(lower), col(upper)), 1.0).otherwise(0.0))
        .as("interval_coverage"))

  /** Gaussian CRPS — metrics/probabilistic.py:26:
    * σ·(z(2Φ(z)−1) + 2φ(z) − 1/√π), z=(a−μ)/σ. */
  def crpsGaussian(df: DataFrame, entity: Seq[String],
                   actual: String, mu: String, sigma: String): DataFrame = {
    val z = try_divide(col(actual) - col(mu), col(sigma))
    val phi = exp(z * z * -0.5) / math.sqrt(2 * math.Pi)
    val cdf = (erfCol(z / math.sqrt(2.0)) + 1) / 2
    val crps = col(sigma) * (z * (cdf * 2 - 1) + phi * 2 - lit(1.0 / math.sqrt(math.Pi)))
    df.groupBy(entity.map(col): _*).agg(avg(crps).as("crps"))
  }

  /** erf via Abramowitz & Stegun 7.1.26 (|ε| ≤ 1.5e-7) — Spark SQL has
    * no built-in erf; pure column algebra keeps it codegen'd. */
  private def erfCol(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) + t *
      (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val y = lit(1.0) - poly * exp(-abs(x) * abs(x))
    when(x >= 0, y).otherwise(-y)
  }

  /** Winkler interval score — metrics/probabilistic.py:131. */
  def winklerScore(df: DataFrame, entity: Seq[String], actual: String,
                   lower: String, upper: String, alpha: Double): DataFrame = {
    val width = col(upper) - col(lower)
    val pen = when(col(actual) < col(lower), (col(lower) - col(actual)) * (2.0 / alpha))
      .when(col(actual) > col(upper), (col(actual) - col(upper)) * (2.0 / alpha))
      .otherwise(0.0)
    df.groupBy(entity.map(col): _*).agg(avg(width + pen).as("winkler_score"))
  }

  /** All point metrics left-join-reduced into one frame per entity —
    * metrics/multi_objective.py:61-107. One pass computes the six
    * joint-frame metrics (single shuffle); mase/rmsse join their
    * in-sample naive denominators on entity. */
  def scoreForecast(j: DataFrame, yTrain: DataFrame, entity: Seq[String],
                    order: Seq[String], value: String, sp: Int): DataFrame = {
    val base = j.groupBy(entity.map(col): _*).agg(
      avg(abs(col("__p") - col("__a"))).as("mae"),
      avg(try_divide(abs(col("__a") - col("__p")), abs(col("__a")))).as("mape"),
      avg(pow(col("__p") - col("__a"), 2)).as("mse"),
      sqrt(avg(pow(col("__p") - col("__a"), 2))).as("rmse"),
      try_divide(sum(abs(col("__p") - col("__a"))), sum(col("__p") + col("__a"))).as("smape"),
      avg(lit(200.0) * abs(col("__p") - col("__a")) /
        (lit(1e-15) + abs(col("__a")) + abs(col("__p")))).as("smape_original"))
    val w = Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)
    val nd = yTrain.withColumn("__nd", col(value) - lag(col(value), sp).over(w))
      .groupBy(entity.map(col): _*)
      .agg(avg(abs(col("__nd"))).as("__mad"), avg(pow(col("__nd"), 2)).as("__msd"))
    base.join(nd, entity, "left")
      .withColumn("mase", try_divide(col("mae"), col("__mad")))
      .withColumn("rmsse", sqrt(try_divide(col("mse"), col("__msd"))))
      .drop("__mad", "__msd")
  }

  /** Mean/median of a per-entity score column across entities —
    * metrics/multi_objective.py:35. */
  def summarizeScores(scores: DataFrame, scoreCol: String): DataFrame =
    scores.agg(
      avg(col(scoreCol)).as("mean"),
      percentile(col(scoreCol), lit(0.5)).as("median"),
      stddev_samp(col(scoreCol)).as("std"),
      count(col(scoreCol)).as("n_entities"))
}

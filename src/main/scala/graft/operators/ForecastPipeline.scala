package graft.operators

import graft.core.Panel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed forecaster — the reference's `Forecaster` object with
  * target-transform chaining (base/forecaster.py:134-277): `fit`
  * applies the target transforms IN ORDER (each step materialized,
  * :147-159) and fits the base forecaster on the transformed panel;
  * `predict` runs the base model in transformed space and then
  * inverts the fitted steps in REVERSE order (:271-275), so the
  * caller never hand-sequences inverts (the round-5 gap; exercised
  * end-to-end by the reference's tests/test_forecasting.py:339).
  *
  * Each fitted step's invert must accept ANY (entity…, time, value)
  * frame in the step's output space — including FUTURE prediction
  * rows the training frame never saw. That rules out reusing the
  * training-frame inverts blindly: a differencing invert on
  * predictions anchors each seasonal lane on the LAST sp pre-diff
  * levels of the training series (captured at fit time as a broadcast
  * artifact), not on the training heads.
  *
  * Scale design: transforms stay declarative column algebra; fit
  * caches the fully transformed panel once (the reference's forced
  * materialization, and every downstream pass — moment aggregation,
  * predict tail — reads that cache); invert artifacts are one-row-
  * per-(entity, phase) broadcast joins. Nothing collects row data.
  */
object ForecastPipeline {

  /** A fitted target-transform step: the transformed panel plus an
    * invert applicable to prediction frames (entity…, timeCol, value)
    * in the step's output space. */
  final case class FittedStep(out: Panel, invert: DataFrame => DataFrame)

  /** An unfitted step: (input panel, prediction time column) → fitted. */
  type Step = (Panel, String) => FittedStep

  /** Per-entity z-score step (preprocessing.py:340); invert is
    * x·σ + μ via the broadcast artifact — valid for any rows. */
  def scaleStep(useMean: Boolean = true, useStd: Boolean = true): Step = (p, _) => {
    val (scaled, art) = Preprocess.scale(p, useMean, useStd)
    FittedStep(p.copy(df = scaled),
      pred => Preprocess.scaleInvert(pred, art, p.entity, p.value))
  }

  /** log1p step; rowwise invert (expm1). */
  def log1pStep: Step = (p, _) =>
    FittedStep(p.copy(df = Preprocess.log1pTransform(p)),
      pred => Preprocess.log1pInvert(pred, p.value))

  /** Per-entity linear-detrend step (preprocessing.py:772, the elite
    * zoo's `detrend(method="linear")` target transform). The invert
    * must extrapolate the fitted trend to FUTURE rows: prediction h
    * (1-based in time order) sits at 0-based index n − 1 + h of the
    * entity's arange, so the artifact carries the training length n
    * alongside (β, α).
    *
    * β/α come from exact DECIMAL moment sums (the p_detrend_linear
    * fixture's formula, β = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)): decimal sums
    * are associative, so the coefficients are bit-identical across
    * partition orders AND engines — covar_samp's double partial sums
    * are not, and a backtest member's rank must not wobble with the
    * merge order. Same estimator, deterministic arithmetic. */
  def detrendLinearStep: Step = (p, timeCol) => {
    val d = p.df
      .withColumn("__i", (row_number().over(p.w) - lit(1)).cast("double"))
      .withColumn("__vd", p.x.cast("decimal(28,10)"))
    val m = d.groupBy(p.entityCols: _*).agg(
      count(lit(1)).cast("double").as("__nn"),
      sum(col("__vd")).cast("double").as("__sy"),
      sum(col("__vd") * col("__i").cast("decimal(18,1)")).cast("double").as("__sxy"),
      sum(col("__i")).as("__sx"),
      sum(col("__i") * col("__i")).as("__sxx"))
    // a single-row entity has zero x-variance: β is undefined (0/0
    // would be NaN in double arithmetic). Null it out instead — the
    // inner joins below then drop the entity, matching the SQL
    // oracle's `beta IS NOT NULL` guard under NULL division.
    val denomE = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
    val betaE = when(denomE =!= 0d,
      (col("__nn") * col("__sxy") - col("__sx") * col("__sy")) / denomE)
    val art = m.select((p.entityCols :+ betaE.as("__beta") :+
      (col("__sy") / col("__nn") - betaE * (col("__sx") / col("__nn"))).as("__alpha") :+
      col("__nn").as("__n")): _*)
      .filter(col("__beta").isNotNull)
    val resid = d.join(broadcast(art), p.entity)
      .withColumn(p.value, p.x - (col("__beta") * col("__i") + col("__alpha")))
      .drop("__i", "__vd", "__beta", "__alpha", "__n")
    FittedStep(p.copy(df = resid), pred => {
      val wh = Window.partitionBy(p.entityCols: _*).orderBy(col(timeCol))
      pred.withColumn("__h", row_number().over(wh))
        .join(broadcast(art), p.entity)
        .withColumn(p.value,
          p.x + (col("__beta") * (col("__n") - 1 + col("__h")) + col("__alpha")))
        .drop("__h", "__beta", "__alpha", "__n")
    })
  }

  /** Per-entity mean-detrend step — the elite zoo's
    * `detrend(method="mean")` target transform (elite.py:139-147,
    * preprocessing.py detrend mean). Residual = x − μ(train); the
    * invert adds μ back, constant over any horizon, so future rows
    * need no position bookkeeping. μ is a plain double avg (the same
    * estimator ScaleX's oracle uses — rd6 absorbs sub-ULP sum-order
    * drift). */
  def detrendMeanStep: Step = (p, _) => {
    val art = p.agg(avg(p.x).as("__mu"))
    val resid = p.df.join(broadcast(art), p.entity)
      .withColumn(p.value, p.x - col("__mu")).drop("__mu")
    FittedStep(p.copy(df = resid),
      pred => pred.join(broadcast(art), p.entity)
        .withColumn(p.value, p.x + col("__mu")).drop("__mu"))
  }

  /** Seasonal differencing step (preprocessing.py:500-571). The
    * future invert reconstructs levels lane-by-lane: prediction h
    * (1-based in time order) has phase (h−1) mod sp, and its level is
    * the captured anchor — the training input's value at position
    * n − sp + phase + 1, i.e. descending row sp − phase — plus the
    * cumulative sum of the lane's predictions up to h. Iterated
    * differences invert outermost-last with each iteration's own
    * anchors (the last sp rows of THAT iteration's input). */
  def diffStep(order: Int = 1, sp: Int = 1): Step = (p, timeCol) => {
    require(order >= 1 && sp >= 1, s"diffStep needs order/sp >= 1 (got $order/$sp)")
    val wd = Window.partitionBy(p.entityCols: _*)
      .orderBy(p.orderCols.map(_.desc): _*)
    var cur = p.df
    val anchors = (1 to order).map { _ =>
      val a = cur.withColumn("__rnd", row_number().over(wd))
        .filter(col("__rnd") <= sp)
        .select((p.entityCols :+ (lit(sp) - col("__rnd")).as("__phase")
          :+ p.x.as("__anchor")): _*)
      cur = cur.withColumn(p.value,
        p.x - lag(p.x, sp).over(p.w))
      a
    }
    FittedStep(p.copy(df = cur), pred => {
      val wh = Window.partitionBy(p.entityCols: _*).orderBy(col(timeCol))
      anchors.reverse.foldLeft(pred) { (d, a) =>
        val lane = Window.partitionBy((p.entityCols :+ col("__phase")): _*)
          .orderBy(col(timeCol))
        // LEFT join: an entity with fewer than sp pre-diff training
        // rows has no anchor for some phases — its predictions must
        // surface as NULL levels, not silently vanish from the output
        d.withColumn("__phase", ((row_number().over(wh) - 1) % sp).cast("int"))
          .join(broadcast(a.withColumn("__phase", col("__phase").cast("int"))),
            p.entity :+ "__phase", "left")
          .withColumn(p.value, col("__anchor") +
            sum(col(p.value)).over(lane.rowsBetween(Window.unboundedPreceding, 0)))
          .drop("__phase", "__anchor")
      }
    })
  }

  /** The fitted pipeline: transformed panel (cached), the fitted
    * steps, and the base model's predict closure. */
  final case class FittedPipeline(transformed: Panel, steps: Seq[FittedStep],
                                  basePredict: (String, Int) => DataFrame) {
    /** Base prediction in transformed space, then reverse-order
      * inverts (base/forecaster.py:271-275). */
    def predict(timeCol: String, fh: Int): DataFrame =
      steps.reverse.foldLeft(basePredict(timeCol, fh))((df, s) => s.invert(df))

    /** Release the fit-time cache. Call when done predicting — a
      * session fitting many pipelines otherwise accumulates one live
      * cached frame per fit. */
    def unpersist(): Unit = transformed.df.unpersist(blocking = false)
  }

  /** Fit: steps in order over the panel, then the base forecaster on
    * the cached transformed result. `baseFit` receives the
    * transformed panel and returns a (timeCol, fh) predict closure —
    * see [[linear]] for the common case. `keepCols` names extra
    * columns (e.g. exog regressors) to retain through the cache; by
    * default only the panel's declared entity/order/value columns are
    * cached — the cache is a pruning barrier, and materializing
    * payload columns the fit never reads (observed: events' props
    * string) multiplies its footprint for nothing. */
  def fit(p: Panel, timeCol: String, steps: Seq[Step],
          baseFit: Panel => (String, Int) => DataFrame,
          keepCols: Seq[String] = Nil): FittedPipeline = {
    val (pT, fitted) = steps.foldLeft((p, Vector.empty[FittedStep])) {
      case ((cur, acc), step) =>
        val fs = step(cur, timeCol)
        (fs.out, acc :+ fs)
    }
    val core = (p.entity ++ p.order ++ Seq(p.value) ++ keepCols).distinct
    val cached = pT.copy(df = pT.df.select(core.map(col): _*).cache())
    FittedPipeline(cached, fitted, baseFit(cached))
  }

  /** The closed-form linear base forecaster as a `baseFit`. */
  def linear(lags: Int, freq: String,
             regParam: Double = 0.0, elasticNetParam: Double = 0.0,
             cdSweeps: Int = 40)
      : Panel => (String, Int) => DataFrame = { pT =>
    val m = LinearForecaster.fit(pT, lags, freq, regParam, elasticNetParam, cdSweeps)
    (timeCol, fh) => m.predict(pT, timeCol, fh)
  }
}

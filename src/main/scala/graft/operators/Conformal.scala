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
  * (single shuffle on entity); the join back onto predictions
  * broadcasts when the entity dimension is small. Quantiles use
  * NEAREST-RANK interpolation — index round(α·(n−1)) into the sorted
  * residuals — matching the reference's polars `quantile(alpha)`
  * default ('nearest'), not linear interpolation. The sorted-residual
  * array is per-entity (series-length bounded), never global.
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
    // nearest-rank: element round(α·(n−1))+1 (1-based) of the
    // ascending-sorted residuals — polars' default interpolation,
    // round half-away-from-zero
    val scores = yResid.groupBy(entity.map(col): _*)
      .agg(sort_array(collect_list(col(residCol))).as("__sorted"))
      .withColumn("quantile", explode(typedLit(alphas)))
      // collect_list drops nulls, so an entity whose residuals are all
      // null yields an EMPTY sorted array — element_at on it is an
      // ANSI error (index 0 for α>0.5, out-of-bounds for the rest).
      // No residual information → null band, not a job-killing crash.
      .withColumn("__score",
        when(size(col("__sorted")) > 0, element_at(col("__sorted"),
          floor(col("quantile") * (size(col("__sorted")) - 1) + 0.5).cast("int") + 1)))
      .drop("__sorted")
    // fan the alphas out on the PREDICTION side and join per
    // (entity, alpha): an entity with predictions but no residual rows
    // at all still gets one null-band row per alpha (the
    // one-band-per-alpha contract), instead of a single null-quantile
    // row from a bare entity-keyed left join
    yPred.withColumn("quantile", explode(typedLit(alphas)))
      .join(scores, entity :+ "quantile", "left")
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
      // round BEFORE the int cast: 0.29 * 100 = 28.999999999999996 in
      // IEEE doubles and a bare cast truncates to band 28
      .withColumn("quantile", round(col("quantile") * 100).cast("int"))
  }

  /** In-sample residuals (actual − predicted) for an aligned frame
    * produced by [[Metrics.aligned]]: (entity..., keys..., a, p). */
  def residuals(aligned: DataFrame, out: String = "residual"): DataFrame =
    aligned.withColumn(out, col("a") - col("p"))

  /** Backtest — backtesting.py:108-250: per expanding-window split,
    * fit on the train slice and predict the next `testSize` steps; tag
    * each prediction with its split id and join the held-out actuals
    * on (entity, time) — replacing the reference's positional sort-zip
    * (:152-155) with an explicit key join (SURVEY.md §7.5(2)).
    *
    * `fitPredict(train, fh)` is any forecaster closure. The split
    * frames are filters over one cached position frame, so the driver
    * loop reuses a single scan; each fit is an independent Spark job
    * (parallelizable across splits by the caller if desired). */
  def backtest(p: graft.core.Panel, timeCol: String,
               testSize: Int, nSplits: Int, stepSize: Int,
               fitPredict: (graft.core.Panel, Int) => DataFrame,
               prePositioned: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    require(nSplits > 0, s"backtest needs nSplits > 0 (got $nSplits)")
    // materialize the positioned frame ONCE — every split's train and
    // test are filters over it, and each fitPredict's actions would
    // otherwise re-run the row_number/count windows over the whole
    // panel per split (the scaladoc's "one cached position frame"
    // promise, now actually kept). localCheckpoint also cuts the
    // lineage so the 2·nSplits downstream plans stay small.
    // `prePositioned` lets a caller running MANY backtests over the
    // SAME panel (the elite zoo) pass one shared positioned frame —
    // panel cols + __rn/__cnt, e.g. a projection of its cached lag
    // frame — instead of each member checkpointing its own panel-width
    // copy (at 1M entities, 6 concurrent members' positioned frames
    // were ~37 GB of scratch; the caller owns the shared frame's
    // lifecycle).
    val owned = prePositioned.isEmpty
    val positioned = prePositioned.getOrElse(
      CrossValidation.withPosition(p).localCheckpoint(true))
    val splits = CrossValidation.expandingWindowSplit(p, testSize, nSplits, stepSize,
      Some(positioned))
    // fitPredict may run Spark actions (model fits) — overlap the
    // independent splits as concurrent jobs; lazy closures (naive)
    // finish instantly either way
    val tagged = Await.result(Future.sequence(splits.zipWithIndex.map {
      case ((train, test), i) => Future {
      val trainPanel = p.copy(df = train)
      // join pred↔actual on (entity, horizon step): the explicit-key
      // form of the reference's timestamp-overwriting sort-zip
      // (backtesting.py:152-155) — robust to irregular time axes
      val pred = fitPredict(trainPanel, testSize)
        .withColumn("__h", row_number().over(
          Window.partitionBy(p.entityCols: _*).orderBy(col(timeCol))))
        .select((p.entityCols :+ col("__h") :+ col(p.value).as("__pred")): _*)
      val actual = test
        .withColumn("__h", row_number().over(
          Window.partitionBy(p.entityCols: _*).orderBy(p.orderCols: _*)))
        .select((p.entityCols ++ Seq(col("__h"), col(timeCol), p.x.as("__actual"))): _*)
      actual.join(pred, p.entity :+ "__h", "inner")
        .withColumn("split", lit(i))
    } }), Duration.Inf)
    // materialize the (entities × splits × testSize) result and FREE
    // the full-width positioned frame deterministically: a 35-member
    // zoo runs many backtests concurrently, and each positioned
    // checkpoint is panel-width — left to ContextCleaner they
    // accumulate until a GC, which exhausted the r11 1M-entity soak's
    // scratch disk. The result is tiny; consumers (scorers, enbpi,
    // conformalize) all reference it repeatedly anyway.
    val out = tagged.reduce(_ unionByName _)
      .select((p.entityCols ++ Seq(col(timeCol), col("split"),
        col("__actual").as("actual"), col("__pred").as("pred"))): _*)
      .localCheckpoint(eager = true)
    // releaseCheckpoint, NOT unpersist (ADVICE r11): Dataset.unpersist
    // only clears CacheManager entries — a localCheckpoint's blocks
    // live in the block manager under its RDD id and linger until a
    // driver GC lets ContextCleaner find them. releaseCheckpoint drops
    // the checkpoint RDD's blocks directly (EliteDeep.scala doc).
    if (owned) EliteDeep.releaseCheckpoint(positioned)
    out
  }
}

package graft.operators

import graft.core.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series cross-validation splitters — per-entity ordered slices
  * (reference: functime/cross_validation.py:48-289).
  *
  * All splitters are pure filters over row_number/count windows: no
  * data movement beyond the one entity-shuffle, and each split is a
  * lazily-filtered view of the same plan — persist the windowed frame
  * once and all splits reuse it (the reference's `collect_all`
  * equivalent, SURVEY.md §4).
  */
object CrossValidation {

  /** Adds `__rn` (1-based position) and `__cnt` (series length). */
  def withPosition(p: Panel): DataFrame =
    p.df
      .withColumn("__rn", row_number().over(p.w))
      .withColumn("__cnt", count(lit(1)).over(p.we))

  /** train = first n−k rows, test = last k rows per entity —
    * cross_validation.py:118-157. */
  def trainTestSplit(p: Panel, testSize: Int): (DataFrame, DataFrame) = {
    val d = withPosition(p)
    (d.filter(col("__rn") <= col("__cnt") - testSize).drop("__rn", "__cnt"),
     d.filter(col("__rn") > col("__cnt") - testSize).drop("__rn", "__cnt"))
  }

  /** Fractional variant: k = floor(frac·len) per entity. */
  def trainTestSplitFrac(p: Panel, testFrac: Double): (DataFrame, DataFrame) = {
    val d = withPosition(p).withColumn("__k", floor(col("__cnt") * testFrac))
    (d.filter(col("__rn") <= col("__cnt") - col("__k")).drop("__rn", "__cnt", "__k"),
     d.filter(col("__rn") > col("__cnt") - col("__k")).drop("__rn", "__cnt", "__k"))
  }

  /** Expanding-window CV — cross_validation.py:160:
    * split i (0-based): cutoff = test + (n_splits−1−i)·step,
    * train = rows [1, len−cutoff], test = next testSize rows. */
  def expandingWindowSplit(p: Panel, testSize: Int, nSplits: Int, stepSize: Int,
                           positioned: Option[DataFrame] = None)
      : Seq[(DataFrame, DataFrame)] = {
    val d = positioned.getOrElse(withPosition(p))
    (0 until nSplits).map { i =>
      val cutoff = testSize + (nSplits - 1 - i) * stepSize
      val trainEnd = col("__cnt") - cutoff
      (d.filter(col("__rn") <= trainEnd).drop("__rn", "__cnt"),
       d.filter(col("__rn") > trainEnd && col("__rn") <= trainEnd + testSize)
         .drop("__rn", "__cnt"))
    }
  }

  /** Sliding-window CV — cross_validation.py:204: fixed train window
    * of `windowSize` rows ending at the expanding cutoff. */
  def slidingWindowSplit(p: Panel, testSize: Int, nSplits: Int, stepSize: Int,
                         windowSize: Int): Seq[(DataFrame, DataFrame)] = {
    val d = withPosition(p)
    (0 until nSplits).map { i =>
      val cutoff = testSize + (nSplits - 1 - i) * stepSize
      val trainEnd = col("__cnt") - cutoff
      (d.filter(col("__rn") > trainEnd - windowSize && col("__rn") <= trainEnd)
         .drop("__rn", "__cnt"),
       d.filter(col("__rn") > trainEnd && col("__rn") <= trainEnd + testSize)
         .drop("__rn", "__cnt"))
    }
  }

  /** One-pass variant: tag every row with the split ids of the train
    * sets it belongs to (array column `splits`) — a single scan
    * replaces nSplits filters when all splits are consumed together. */
  def expandingWindowTagged(p: Panel, testSize: Int, nSplits: Int, stepSize: Int): DataFrame = {
    val d = withPosition(p)
    val trainOf = (0 until nSplits).map { i =>
      val cutoff = testSize + (nSplits - 1 - i) * stepSize
      when(col("__rn") <= col("__cnt") - cutoff, i)
    }
    d.withColumn("train_splits", array_compact(array(trainOf: _*)))
  }

  /** Drop entities shorter than minLength (the reference's
    * check_backtest_lengths, base/forecaster.py:40-77). */
  def filterShortSeries(p: Panel, minLength: Long): DataFrame =
    p.df.withColumn("__cnt", count(lit(1)).over(p.we))
      .filter(col("__cnt") >= minLength).drop("__cnt")
}

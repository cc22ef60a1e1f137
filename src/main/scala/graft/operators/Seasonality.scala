package graft.operators

import graft.core.Panel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonality / calendar features (reference: functime/seasonality/). */
object Seasonality {

  /** Split a frequency alias into (count, unit) — offsets.py:6-16
    * (`_strip_freq_alias`): "3mo" → (3, "mo"). */
  def stripFreqAlias(freq: String): (Int, String) = {
    val f = freq.toLowerCase
    // longest suffix first so "mo" wins over "m" ("o" is not an alias)
    val aliases = Seq("mo", "s", "m", "h", "d", "w", "q", "y", "i")
    aliases.collectFirst {
      case a if f.endsWith(a) && f.dropRight(a.length).forall(_.isDigit)
        && f.length > a.length =>
        (f.dropRight(a.length).toInt, a)
    }.getOrElse(throw new IllegalArgumentException(s"unknown freq alias $freq"))
  }

  /** Candidate seasonal periods per sampling frequency —
    * offsets.py:19-62 (`freq_to_sp`, after Hyndman's seasonal-period
    * table). */
  def freqToSp(freq: String): Seq[Int] = freq.toLowerCase match {
    case "1s"  => Seq(60, 3600, 86400, 604800, 31557600)
    case "1m"  => Seq(60, 1440, 10080, 525960)
    case "30m" => Seq(48, 336, 17532)
    case "1h"  => Seq(24, 168, 8766)
    case "1d"  => Seq(7, 365)
    case "1w"  => Seq(52)
    case "1mo" => Seq(12)
    case "1q" | "3mo" => Seq(4)
    case "1y"  => Seq(1)
    case other => throw new IllegalArgumentException(s"Offset '$other' not supported")
  }

  /** Fourier terms — seasonality/fourier.py:10: per entity,
    * coef = ((row position) mod sp)/sp; add cos/sin_{sp}_{k}, k=1..K. */
  def addFourierTerms(p: Panel, sp: Int, k: Int): DataFrame = {
    val pr = p.withRowIdx("__i")
    val coef = (col("__i") % sp).cast("double") / sp
    (1 to k).foldLeft(pr.df) { (d, ki) =>
      d.withColumn(s"cos_${sp}_$ki", cos(lit(2 * math.Pi * ki) * coef))
        .withColumn(s"sin_${sp}_$ki", sin(lit(2 * math.Pi * ki) * coef))
    }.drop("__i")
  }

  /** Calendar attribute extraction — seasonality/calendar.py:12. */
  def addCalendarEffects(df: DataFrame, timeCol: String, attrs: Seq[String]): DataFrame =
    attrs.foldLeft(df) { (d, a) =>
      val c = a match {
        case "minute"  => minute(col(timeCol))
        case "hour"    => hour(col(timeCol))
        case "day"     => dayofmonth(col(timeCol))
        case "weekday" => dayofweek(col(timeCol))       // 1=Sunday..7=Saturday
        case "week"    => weekofyear(col(timeCol))
        case "month"   => month(col(timeCol))
        case "quarter" => quarter(col(timeCol))
        case "year"    => year(col(timeCol))
        case other     => throw new IllegalArgumentException(s"unknown calendar attr $other")
      }
      d.withColumn(a, c.cast("string"))
    }

  /** Holiday effects — seasonality/calendar.py:57. The reference uses
    * the python-holidays lookup; we take a driver-provided holiday
    * table (date, label) and broadcast-join on date. */
  def addHolidayEffects(df: DataFrame, timeCol: String, holidays: DataFrame,
                        dateCol: String = "date", labelCol: String = "holiday"): DataFrame =
    df.join(broadcast(holidays),
      to_date(df(timeCol)) === holidays(dateCol), "left")
      .drop(dateCol)

  /** Fourier deseasonalization — preprocessing.py:941-1027, Spark-first:
    * instead of the reference's per-entity sklearn fit inside
    * `map_elements` (pickled regressor stored in a column), the OLS of
    * y on [1, cos_k, sin_k] is solved from per-entity normal-equation
    * moments: Σxᵢxⱼ / Σxᵢy are plain `sum` aggregates (map-side
    * partials, one shuffle on entity, O(p²) state per entity regardless
    * of series length), then the (2K+1)-dim system is solved row-wise.
    * Artifacts are plain coefficient arrays — broadcast-joinable at
    * invert time, no pickles.
    *
    * Returns (residual frame with `value` replaced by y − seasonal,
    * artifact (entity..., coef array)). */
  def deseasonalizeFourier(p: Panel, sp: Int, k: Int): (DataFrame, DataFrame) = {
    val d0 = addFourierTerms(p, sp, k)
    val featNames = (1 to k).flatMap(ki => Seq(s"cos_${sp}_$ki", s"sin_${sp}_$ki"))
    val feats: Seq[Column] = lit(1.0) +: featNames.map(col)
    val nP = feats.length
    val pairs = for { i <- 0 until nP; j <- i until nP } yield (i, j)
    val moments =
      pairs.map { case (i, j) => sum(feats(i) * feats(j)).as(s"__xtx_${i}_$j") } ++
        (0 until nP).map(i => sum(feats(i) * p.x).as(s"__xty_$i"))
    // rows with a null target must drop from BOTH sides of the normal
    // equations — summing them into XtX but not Xty (sum() skips
    // nulls) would silently bias the coefficients, and an all-null
    // entity would NPE inside the solve UDF
    val mom = d0.filter(p.x.isNotNull)
      .groupBy(p.entityCols: _*).agg(moments.head, moments.tail: _*)
      .select(p.entityCols ++ Seq(
        array(pairs.map { case (i, j) => col(s"__xtx_${i}_$j") }: _*).as("__xtx"),
        array((0 until nP).map(i => col(s"__xty_$i")): _*).as("__xty")): _*)
    val solveUdf = udf { (xtx: Seq[Double], xty: Seq[Double]) =>
      val m = Array.ofDim[Double](nP, nP)
      var idx = 0
      var i = 0
      while (i < nP) {
        var j = i
        while (j < nP) { m(i)(j) = xtx(idx); m(j)(i) = xtx(idx); idx += 1; j += 1 }
        i += 1
      }
      graft.functions.Kernels.solve(m, xty.toArray).toSeq
    }
    val artifact = mom.select(p.entityCols :+ solveUdf(col("__xtx"), col("__xty")).as("coef"): _*)
    val seasonal = feats.zipWithIndex
      .map { case (f, i) => f * element_at(col("coef"), i + 1) }
      .reduce(_ + _)
    // LEFT join: an entity absent from the artifact (all-null target)
    // keeps its rows with null residuals instead of vanishing
    val resid = d0.join(broadcast(artifact), p.entity, "left")
      .withColumn(p.value, p.x - seasonal)
      .drop((featNames :+ "coef"): _*)
    (resid, artifact)
  }

  /** Invert: re-add the fitted seasonal term (preprocessing.py:1029).
    *
    * Phase is ROW-POSITION based (`arg_sort % sp` in the reference,
    * row_number here — identical semantics): inverting a frame that
    * starts mid-cycle (e.g. a future-only forecast frame when
    * trainLen % sp != 0) restarts the phase at 0 exactly like the
    * reference would. To invert forecasts phase-aligned with
    * training, invert a frame spanning train+future rows. */
  def deseasonalizeFourierInvert(residuals: Panel, artifact: DataFrame,
                                 sp: Int, k: Int): DataFrame = {
    val d0 = addFourierTerms(residuals, sp, k)
    val featNames = (1 to k).flatMap(ki => Seq(s"cos_${sp}_$ki", s"sin_${sp}_$ki"))
    val feats: Seq[Column] = lit(1.0) +: featNames.map(col)
    val seasonal = feats.zipWithIndex
      .map { case (f, i) => f * element_at(col("coef"), i + 1) }
      .reduce(_ + _)
    d0.join(broadcast(artifact), residuals.entity)
      .withColumn(residuals.value, residuals.x + seasonal)
      .drop((featNames :+ "coef"): _*)
  }

  /** Per-entity future time scaffold — ranges.py:9-46: fh steps past
    * each entity's cutoff (max time). Integer frequency ("1i") uses
    * unit steps; calendar frequencies use day/month arithmetic. */
  def futureRanges(p: Panel, timeCol: String, fh: Int, freq: String): DataFrame = {
    val cutoffs = p.df.groupBy(p.entityCols: _*).agg(max(col(timeCol)).as("__cutoff"))
    cutoffs
      .withColumn("__h", explode(sequence(lit(1), lit(fh))))
      .withColumn(timeCol, Forecasters.futureTime(freq))
      .select((p.entityCols ++ Seq(col(timeCol), col("__h"))): _*)
  }
}

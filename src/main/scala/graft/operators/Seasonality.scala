package graft.operators

import graft.core.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonality / calendar features (reference: functime/seasonality/). */
object Seasonality {

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

  /** Per-entity future time scaffold — ranges.py:9-46: fh steps past
    * each entity's cutoff (max time). Integer frequency ("1i") uses
    * unit steps; calendar frequencies use day/month arithmetic. */
  def futureRanges(p: Panel, timeCol: String, fh: Int, freq: String): DataFrame = {
    val cutoffs = p.df.groupBy(p.entityCols: _*).agg(max(col(timeCol)).as("__cutoff"))
    val steps = explode(sequence(lit(1), lit(fh))).as("__h")
    val future = freq match {
      case "1i" => col("__cutoff") + col("__h")
      case "1d" => date_add(col("__cutoff"), col("__h"))
      case "1w" => date_add(col("__cutoff"), col("__h") * 7)
      case "1mo" => add_months(col("__cutoff"), col("__h"))
      case "3mo" => add_months(col("__cutoff"), col("__h") * 3)
      case "1y" => add_months(col("__cutoff"), col("__h") * 12)
      case other => throw new IllegalArgumentException(s"unknown freq $other")
    }
    cutoffs.select((p.entityCols :+ steps): _*)
      .join(cutoffs, p.entity)
      .withColumn(timeCol, future)
      .select((p.entityCols ++ Seq(col(timeCol), col("__h"))): _*)
  }
}

package graft.operators

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based holiday generation from ISO-2 country codes — the
  * JVM-side counterpart of the reference's `holidays` package lookup
  * (seasonality/calendar.py:57-106 `add_holiday_effects`). National
  * public holidays are closed-form: fixed dates plus Easter-derived
  * offsets (anonymous Gregorian computus), so a handful of rules per
  * country reproduces the table the reference builds per year range.
  *
  * Scope: the base national holidays for US, GB, DE, FR, CA.
  * python-holidays' `observed=True` substitute days (e.g. "New Year's
  * Day (observed)" on the adjacent Friday/Monday) are intentionally
  * out of scope — the base-date labels are the signal a calendar
  * regressor consumes. Labels are normalized the way the reference
  * normalizes them (calendar.py:93-99): lowercase, drop `'` and `-`,
  * spaces to `_`.
  *
  * The generated table is tiny (≈10 rows × years × codes), built on
  * the driver and broadcast — at any data scale the join is one
  * map-side hash probe per row, never a shuffle.
  */
object HolidayCalendar {

  /** Easter Sunday (Gregorian, anonymous computus). */
  def easter(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  /** The reference's label normalization (calendar.py:93-99). */
  def normalize(label: String): String =
    label.toLowerCase.replace("'", "").replace("-", "").replace(" ", "_")

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.lastInMonth(dow))

  /** Base national holidays of one ISO-2 code for one year, with the
    * python-holidays label (pre-normalization). */
  def holidaysForYear(code: String, year: Int): Seq[(LocalDate, String)] = {
    val e = easter(year)
    code.toUpperCase match {
      case "US" => Seq(
        LocalDate.of(year, 1, 1) -> "New Year's Day",
        nthWeekday(year, 1, DayOfWeek.MONDAY, 3) -> "Martin Luther King Jr. Day",
        nthWeekday(year, 2, DayOfWeek.MONDAY, 3) -> "Washington's Birthday",
        lastWeekday(year, 5, DayOfWeek.MONDAY) -> "Memorial Day") ++
        (if (year >= 2021)
          Seq(LocalDate.of(year, 6, 19) -> "Juneteenth National Independence Day")
        else Nil) ++ Seq(
        LocalDate.of(year, 7, 4) -> "Independence Day",
        nthWeekday(year, 9, DayOfWeek.MONDAY, 1) -> "Labor Day",
        nthWeekday(year, 10, DayOfWeek.MONDAY, 2) -> "Columbus Day",
        LocalDate.of(year, 11, 11) -> "Veterans Day",
        nthWeekday(year, 11, DayOfWeek.THURSDAY, 4) -> "Thanksgiving",
        LocalDate.of(year, 12, 25) -> "Christmas Day")
      case "GB" => Seq(
        LocalDate.of(year, 1, 1) -> "New Year's Day",
        e.minusDays(2) -> "Good Friday",
        e.plusDays(1) -> "Easter Monday",
        nthWeekday(year, 5, DayOfWeek.MONDAY, 1) -> "May Day",
        lastWeekday(year, 5, DayOfWeek.MONDAY) -> "Spring Bank Holiday",
        lastWeekday(year, 8, DayOfWeek.MONDAY) -> "Summer Bank Holiday",
        LocalDate.of(year, 12, 25) -> "Christmas Day",
        LocalDate.of(year, 12, 26) -> "Boxing Day")
      case "DE" => Seq(
        LocalDate.of(year, 1, 1) -> "Neujahr",
        e.minusDays(2) -> "Karfreitag",
        e.plusDays(1) -> "Ostermontag",
        LocalDate.of(year, 5, 1) -> "Erster Mai",
        e.plusDays(39) -> "Christi Himmelfahrt",
        e.plusDays(50) -> "Pfingstmontag",
        LocalDate.of(year, 10, 3) -> "Tag der Deutschen Einheit",
        LocalDate.of(year, 12, 25) -> "Erster Weihnachtstag",
        LocalDate.of(year, 12, 26) -> "Zweiter Weihnachtstag")
      case "FR" => Seq(
        LocalDate.of(year, 1, 1) -> "Jour de l'an",
        e.plusDays(1) -> "Lundi de Pâques",
        LocalDate.of(year, 5, 1) -> "Fête du Travail",
        LocalDate.of(year, 5, 8) -> "Fête de la Victoire",
        e.plusDays(39) -> "Ascension",
        e.plusDays(50) -> "Lundi de Pentecôte",
        LocalDate.of(year, 7, 14) -> "Fête nationale",
        LocalDate.of(year, 8, 15) -> "Assomption",
        LocalDate.of(year, 11, 1) -> "Toussaint",
        LocalDate.of(year, 11, 11) -> "Armistice",
        LocalDate.of(year, 12, 25) -> "Noël")
      case "CA" => Seq(
        LocalDate.of(year, 1, 1) -> "New Year's Day",
        e.minusDays(2) -> "Good Friday",
        // Victoria Day: the Monday on or before May 24
        {
          var d = LocalDate.of(year, 5, 24)
          while (d.getDayOfWeek != DayOfWeek.MONDAY) d = d.minusDays(1)
          d
        } -> "Victoria Day",
        LocalDate.of(year, 7, 1) -> "Canada Day",
        nthWeekday(year, 9, DayOfWeek.MONDAY, 1) -> "Labour Day",
        nthWeekday(year, 10, DayOfWeek.MONDAY, 2) -> "Thanksgiving",
        LocalDate.of(year, 11, 11) -> "Remembrance Day",
        LocalDate.of(year, 12, 25) -> "Christmas Day",
        LocalDate.of(year, 12, 26) -> "Boxing Day")
      case other => throw new IllegalArgumentException(
        s"unsupported country code '$other' (supported: US, GB, DE, FR, CA)")
    }
  }

  /** Normalized (date, label) rows for a code over a year range;
    * first rule wins on a date collision (a date carries one label,
    * like the python-holidays dict). */
  def holidays(code: String, years: Range): Seq[(LocalDate, String)] = {
    val all = years.flatMap(y => holidaysForYear(code, y))
      .map { case (d, l) => (d, normalize(l)) }
    val seen = scala.collection.mutable.LinkedHashMap.empty[LocalDate, String]
    all.foreach { case (d, l) => if (!seen.contains(d)) seen += d -> l }
    seen.toSeq
  }

  /** add_holiday_effects from country codes (calendar.py:57-106): one
    * nullable string column `holiday__<CC>` per code, left-joined on
    * the DATE of `timeCol`. The year span comes from the data (the
    * reference derives it from min/max timestamps); each per-code
    * table is generated on the driver and broadcast. */
  def addHolidayEffectsFromCodes(df: DataFrame, timeCol: String,
                                 countryCodes: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val yr = df.agg(min(year(col(timeCol))), max(year(col(timeCol)))).head()
    require(!yr.isNullAt(0), s"no rows / all-null $timeCol — cannot derive year span")
    val years = yr.getInt(0) to yr.getInt(1)
    countryCodes.foldLeft(df) { (d, code) =>
      val tbl = holidays(code, years)
        .map { case (dt, l) => (java.sql.Date.valueOf(dt), l) }
        .toDF("__hdate", s"holiday__$code")
      d.join(broadcast(tbl), to_date(d(timeCol)) === tbl("__hdate"), "left")
        .drop("__hdate")
    }
  }
}

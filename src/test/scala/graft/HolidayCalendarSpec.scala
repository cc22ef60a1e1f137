package graft

import java.time.LocalDate

import graft.operators.HolidayCalendar
import org.apache.spark.sql.functions._

/** Pins the rule-based holiday generator (calendar.py:57-106
  * counterpart) to externally known dates. */
class HolidayCalendarSpec extends SparkSpec {

  test("Gregorian Easter computus on known years") {
    assert(HolidayCalendar.easter(2016) == LocalDate.of(2016, 3, 27))
    assert(HolidayCalendar.easter(2024) == LocalDate.of(2024, 3, 31))
    assert(HolidayCalendar.easter(2025) == LocalDate.of(2025, 4, 20))
    assert(HolidayCalendar.easter(2038) == LocalDate.of(2038, 4, 25))
  }

  test("label normalization matches the reference's replacements") {
    assert(HolidayCalendar.normalize("New Year's Day") == "new_years_day")
    assert(HolidayCalendar.normalize("Martin Luther King Jr. Day") ==
      "martin_luther_king_jr._day")
    assert(HolidayCalendar.normalize("Fête de la Victoire") == "fête_de_la_victoire")
  }

  test("US floating and fixed holidays on known dates") {
    val us2024 = HolidayCalendar.holidays("US", 2024 to 2024).toMap
    assert(us2024(LocalDate.of(2024, 1, 15)) == "martin_luther_king_jr._day")
    assert(us2024(LocalDate.of(2024, 5, 27)) == "memorial_day")
    assert(us2024(LocalDate.of(2024, 11, 28)) == "thanksgiving")
    assert(us2024(LocalDate.of(2024, 7, 4)) == "independence_day")
    // Juneteenth only from 2021
    val us2020 = HolidayCalendar.holidays("US", 2020 to 2020).toMap
    assert(!us2020.contains(LocalDate.of(2020, 6, 19)))
    assert(HolidayCalendar.holidays("US", 2021 to 2021)
      .toMap.contains(LocalDate.of(2021, 6, 19)))
  }

  test("GB / DE / FR / CA Easter-derived holidays on known dates") {
    val gb = HolidayCalendar.holidays("GB", 2024 to 2024).toMap
    assert(gb(LocalDate.of(2024, 4, 1)) == "easter_monday")
    assert(gb(LocalDate.of(2024, 5, 27)) == "spring_bank_holiday")
    val de = HolidayCalendar.holidays("DE", 2024 to 2024).toMap
    assert(de(LocalDate.of(2024, 5, 20)) == "pfingstmontag")
    assert(de(LocalDate.of(2024, 5, 9)) == "christi_himmelfahrt")
    val fr = HolidayCalendar.holidays("FR", 2024 to 2024).toMap
    assert(fr(LocalDate.of(2024, 5, 9)) == "ascension")
    val ca = HolidayCalendar.holidays("CA", 2024 to 2024).toMap
    assert(ca(LocalDate.of(2024, 5, 20)) == "victoria_day")
    assert(ca(LocalDate.of(2024, 10, 14)) == "thanksgiving")
  }

  test("unsupported code fails fast") {
    intercept[IllegalArgumentException](HolidayCalendar.holidays("XX", 2024 to 2024))
  }

  test("addHolidayEffectsFromCodes joins one nullable column per code") {
    import spark.implicits._
    val df = Seq("2024-07-04 10:00:00", "2024-07-05 10:00:00", "2024-12-25 00:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val out = HolidayCalendar.addHolidayEffectsFromCodes(df, "ts", Seq("US", "GB"))
      .orderBy("ts").collect()
    assert(out.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("independence_day"), None, Some("christmas_day")))
    assert(out.map(r => Option(r.getString(2))).toSeq ==
      Seq(None, None, Some("christmas_day")))
  }
}

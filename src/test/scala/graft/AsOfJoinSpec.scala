package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Backward as-of join semantics: latest right row ≤ left time per
  * entity, inclusive ties, null when nothing precedes, tolerance
  * windows. */
class AsOfJoinSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private val left = Seq(
    (1L, 5L, "l5"), (1L, 10L, "l10"), (1L, 15L, "l15"),
    (2L, 3L, "m3")
  ).toDF("entity", "t", "tag")

  private val right = Seq(
    (1L, 4L, 40.0), (1L, 10L, 100.0), (1L, 12L, 120.0),
    (2L, 7L, 70.0) // after every left row of entity 2
  ).toDF("entity", "rt", "quote")

  test("attaches the latest right value at or before each left time") {
    val out = AsOfJoin.asofBackward(left, right, Seq("entity"), "t", "rt", Seq("quote"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("quote")))).toMap
    assert(out("l5") == Some(40.0))    // 4 <= 5
    assert(out("l10") == Some(100.0))  // inclusive tie at 10
    assert(out("l15") == Some(120.0))  // latest of {4,10,12}
    assert(out("m3").isEmpty)          // nothing at or before 3
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asofBackward(left, right, Seq("entity"), "t", "rt",
      Seq("quote"), tolerance = Some(2L))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("quote")))).toMap
    assert(out("l5") == Some(40.0))   // age 1 <= 2
    assert(out("l10") == Some(100.0)) // age 0
    assert(out("l15").isEmpty)        // latest is 12, age 3 > 2
  }

  test("every left row survives (left-join semantics) and left columns pass through") {
    val out = AsOfJoin.asofBackward(left, right, Seq("entity"), "t", "rt", Seq("quote"))
    assert(out.count() == left.count())
    assert(out.columns.toSet == Set("entity", "t", "tag", "quote"))
  }

  test("a null in the matched row is attached verbatim, not an older non-null") {
    // polars join_asof / DuckDB ASOF JOIN attach the matched right ROW;
    // per-column carry-forward would leak 40.0/"a" from t=4 into the
    // t=10 match whose quote is null
    val r2 = Seq(
      (1L, 4L, Option(40.0), Option("a")),
      (1L, 10L, Option.empty[Double], Option("b"))
    ).toDF("entity", "rt", "quote", "grade")
    val out = AsOfJoin.asofBackward(left, r2, Seq("entity"), "t", "rt",
      Seq("quote", "grade"))
      .collect().map(r => (r.getAs[String]("tag"),
        (Option(r.getAs[Any]("quote")), Option(r.getAs[Any]("grade"))))).toMap
    assert(out("l5") == ((Some(40.0), Some("a"))))
    assert(out("l10") == ((None, Some("b"))))  // matched row's null survives
    assert(out("l15") == ((None, Some("b"))))
  }

  test("tolerance pairs the age check with the matched row's own time") {
    // right value at t=4 is null, t=2 is non-null: the match at left
    // t=5 is the t=4 ROW (null), and its age (1) is what tolerance
    // sees — not the older non-null row's age
    val r3 = Seq(
      (1L, 2L, Option(20.0)),
      (1L, 4L, Option.empty[Double])
    ).toDF("entity", "rt", "quote")
    val out = AsOfJoin.asofBackward(left, r3, Seq("entity"), "t", "rt",
      Seq("quote"), tolerance = Some(1L))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("quote")))).toMap
    assert(out("l5").isEmpty)   // matched row (t=4, null) within tolerance: stays null
    assert(out("l10").isEmpty)  // age 6 > 1: nulled
  }
}

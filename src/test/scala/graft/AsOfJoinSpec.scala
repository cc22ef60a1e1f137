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
}

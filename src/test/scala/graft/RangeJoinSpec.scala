package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Banded range join: trailing-window pairing without a theta join. */
class RangeJoinSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  // times in seconds; band width 10
  private val rows = Seq(
    (1L, 100L, 1L), (1L, 105L, 2L), (1L, 109L, 3L), (1L, 125L, 4L),
    (2L, 100L, 5L)
  ).toDF("entity", "t", "id")

  test("joinBand pairs each row with same-entity rows in [t-w, t)") {
    val pairs = RangeJoin.joinBand(rows, rows.withColumnRenamed("id", "rid")
      .withColumnRenamed("t", "rt"), Seq("entity"), "t", "rt", Seq("rid"), 10L)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id2 (105): sees 100; id3 (109): sees 100,105; id1/id4/id5: none
    assert(pairs == Set((2L, 1L), (3L, 1L), (3L, 2L)))
  }

  test("countInBand preserves zero-match rows") {
    val out = RangeJoin.countInBand(rows, rows.withColumnRenamed("t", "rt")
      .withColumnRenamed("id", "rid"), Seq("entity"), "t", "rt", Seq("id"), 10L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_in_band")).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
  }

  test("band crossing a bin boundary still matches (adjacent-bin probe)") {
    // width 10: left at 121 must see right at 119 (bins 12 vs 11)
    val l = Seq((1L, 121L, 1L)).toDF("entity", "t", "id")
    val r = Seq((1L, 119L, 9L)).toDF("entity", "rt", "rid")
    val pairs = RangeJoin.joinBand(l, r, Seq("entity"), "t", "rt", Seq("rid"), 10L)
    assert(pairs.count() == 1)
  }
}

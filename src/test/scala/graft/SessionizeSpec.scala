package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Gap-based sessionization: boundaries, per-session stats. */
class SessionizeSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("new session starts when the gap exceeds the timeout") {
    // user 1: events at 0, 100, 2000 (gap 1900 > 1800 → new), 2100
    val ev = Seq((1L, t(0)), (1L, t(100)), (1L, t(2000)), (1L, t(2100)),
      (2L, t(50))).toDF("user_id", "ts")
    val out = Sessionize.withSessionIds(ev, Seq("user_id"), "ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
    val byUser1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(byUser1 == Seq(1L, 1L, 2L, 2L), byUser1.toString)
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(1L))
  }

  test("sessionStats aggregates counts and durations per session") {
    val ev = Seq((1L, t(0)), (1L, t(100)), (1L, t(2000)), (1L, t(2100)))
      .toDF("user_id", "ts")
    val out = Sessionize.sessionStats(ev, Seq("user_id"), "ts", 1800L)
      .orderBy("session_id").collect()
      .map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
    assert(out.toSeq == Seq((1L, 2L, 100L), (2L, 2L, 100L)))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a new session starts
  * whenever the gap to the previous same-entity event exceeds
  * `gapSeconds`. Pure window algebra on the entity partitioning —
  * lag → boundary flag → running sum — one shuffle, codegen'd, no
  * state beyond the sort. The canonical building block for
  * user-activity segmentation in a training-data pipeline. */
object Sessionize {

  /** Adds `session_id` (1-based per entity, time order). */
  def withSessionIds(events: DataFrame, entity: Seq[String], timeCol: String,
                     gapSeconds: Long, out: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(w)
    val newSession = when(
      prev.isNull || col(timeCol).cast("long") - prev.cast("long") > gapSeconds,
      lit(1)).otherwise(lit(0))
    events
      .withColumn("__new", newSession)
      .withColumn(out, sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .drop("__new")
  }

  /** Per-session aggregates: event count, span seconds, start/end. */
  def sessionStats(events: DataFrame, entity: Seq[String], timeCol: String,
                   gapSeconds: Long): DataFrame =
    withSessionIds(events, entity, timeCol, gapSeconds)
      .groupBy((entity :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        (max(col(timeCol)).cast("long") - min(col(timeCol)).cast("long"))
          .as("duration_s"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the other time-series join Spark lacks a
  * native operator for: pair every left row with the right rows of
  * the same entity whose time falls in
  * `[leftTime − width, leftTime)` (a trailing band).
  *
  * Physical strategy: NOT a theta join (BroadcastNestedLoop /
  * cartesian per entity — explodes quadratically). Times are
  * bucketized into bins of `width`; each LEFT row probes its own bin
  * and the previous one (a trailing band of width w can only overlap
  * those two), so the join is a pure EQUI-join on (entity, bin) —
  * shuffle-partitioned, AQE-skew-splittable — followed by the exact
  * band filter. Right rows are emitted once per bin (no
  * duplication); left rows fan out ×2 bins. Cost scales with
  * rows × band density, not rows².
  */
object RangeJoin {

  /** Pairs frame: all left columns + `rightTime` and the requested
    * right `valueCols` (null-free inner semantics — left rows with no
    * band match are dropped; use [[countInBand]] for zero-preserving
    * aggregation). Times must be castable to long (seconds for
    * timestamps). */
  def joinBand(left: DataFrame, right: DataFrame, entity: Seq[String],
               leftTime: String, rightTime: String, valueCols: Seq[String],
               widthSeconds: Long): DataFrame = {
    // exact integral floor-division: subtract the non-negative pmod
    // remainder, then `div` (all-long arithmetic). Double division +
    // cast loses precision above 2^53 (nanosecond epochs) and truncates
    // toward zero for negative times — both silently misbin rows.
    def floorDiv(c: String): Column =
      expr(s"($c - pmod($c, ${widthSeconds}L)) div ${widthSeconds}L")
    val l = left.withColumn("__lt", col(leftTime).cast("long"))
      .withColumn("__bin", explode(array(floorDiv("__lt"), floorDiv("__lt") - 1)))
    val r = right.select((entity.map(col) :+ col(rightTime).cast("long").as("__rt")) ++
      valueCols.map(col): _*)
      .withColumn("__bin", floorDiv("__rt"))
    val out = l.join(r, entity :+ "__bin")
      .filter(col("__rt") >= col("__lt") - widthSeconds && col("__rt") < col("__lt"))
      .drop("__bin", "__lt")
    // restore the documented right-time name (it was renamed for the
    // join plumbing); when the left already carries that name (e.g.
    // self-join on the same time column), keep the internal __rt so
    // the output has no ambiguous duplicate — callers select valueCols
    if (left.columns.contains(rightTime)) out
    else out.withColumnRenamed("__rt", rightTime)
  }

  /** Per-left-row count of same-entity right rows in the trailing
    * band — zero-preserving (every left row survives). */
  def countInBand(left: DataFrame, right: DataFrame, entity: Seq[String],
                  leftTime: String, rightTime: String, leftId: Seq[String],
                  widthSeconds: Long, out: String = "n_in_band"): DataFrame = {
    val pairs = joinBand(left, right, entity, leftTime, rightTime, Seq(), widthSeconds)
      .groupBy((entity ++ leftId).map(col): _*)
      .agg(count(lit(1)).as(out))
    left.join(pairs, entity ++ leftId, "left")
      .withColumn(out, coalesce(col(out), lit(0L)))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join Spark lacks natively
  * (polars `join_asof` / DuckDB `ASOF JOIN`): for every left row,
  * attach the latest right row whose time is ≤ the left time, per
  * entity.
  *
  * Physical strategy: NOT a range join (whose candidate set explodes
  * quadratically in dense regions). Both sides are tagged and
  * UNIONED, then one per-entity time-ordered window carries the last
  * non-null right-side values forward onto each left row
  * (`last(col, ignoreNulls) over rowsBetween(-inf, 0)`). Cost = one
  * entity shuffle + one sorted pass, the same shape as every other
  * per-entity operator here — scales to any density skew, and AQE
  * handles hot entities. Right rows sort BEFORE left rows on equal
  * timestamps, giving the inclusive (≤) match of DuckDB/polars.
  *
  * `tolerance` (optional, in the time column's units after cast to
  * long) nulls matches older than `leftTime − tolerance`.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, entity: Seq[String],
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String], tolerance: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    // right side reduced to (entity, time, values); left keeps all cols
    val r = right.select((entity.map(col) :+ col(rightTime).as("__t")) ++
      valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val lAligned = valueCols.foldLeft(l)((d, c) => d.withColumn(c, lit(null).cast(
      r.schema(c).dataType)))
    val unioned = lAligned.select((entity.map(col) :+ col("__t") :+ col("__side")) ++
      valueCols.map(col) ++ lCols.filterNot(c => entity.contains(c) || valueCols.contains(c)).map(col): _*)
      .unionByName(
        r.select((entity.map(col) :+ col("__t") :+ col("__side")) ++ valueCols.map(col): _*),
        allowMissingColumns = true)
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val withMatchTime = carried.withColumn("__rt",
      last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val filtered = withMatchTime.filter(col("__side") === 1)
    val tolApplied = tolerance match {
      case Some(tol) =>
        val stale = col("__rt").isNull ||
          (col("__t").cast("long") - col("__rt").cast("long")) > tol
        valueCols.foldLeft(filtered)((d, c) =>
          d.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
      case None => filtered
    }
    tolApplied.select((lCols ++ valueCols).map(col): _*)
  }
}

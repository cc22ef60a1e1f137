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
  * right ROW — a single struct of (time, values), so null value columns
  * in the matched row are attached verbatim — forward onto each left
  * row (`last(struct, ignoreNulls) over rowsBetween(-inf, 0)`). Cost = one
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
    // a left column named like a valueCol would be silently clobbered
    // by the unpack below AND selected twice — fail loud instead
    val clash = lCols.intersect(valueCols)
    require(clash.isEmpty,
      s"asofBackward: left already has column(s) ${clash.mkString(", ")} — " +
        "rename before joining (the right value would overwrite them)")
    // right side reduced to (entity, time, values); the time + ALL value
    // columns ride in ONE struct so the carried match is a single right
    // ROW (a null in one value column must be attached verbatim, not
    // replaced by an older row's non-null — polars/DuckDB semantics).
    // Null right timestamps are excluded: they sort nulls-FIRST with a
    // non-null row struct, and last(ignoreNulls) would attach them as a
    // bogus match to every left row before the first real right row
    val r = right.select((entity.map(col) :+ col(rightTime).as("__t")) ++
      valueCols.map(col): _*)
      .filter(col("__t").isNotNull)
      .withColumn("__side", lit(0))
      .withColumn("__row", struct(col("__t").as("__mt") +: valueCols.map(col): _*))
      .select((entity.map(col) :+ col("__t") :+ col("__side") :+ col("__row")): _*)
    val rowType = r.schema("__row").dataType
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__row", lit(null).cast(rowType))
    val unioned = l.select((entity.map(col) :+ col("__t") :+ col("__side") :+ col("__row")) ++
      lCols.filterNot(entity.contains).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    // __row as the final tiebreaker: two right rows with the SAME
    // (entity, timestamp) would otherwise sort in arbitrary physical
    // order and last() would pick nondeterministically run-to-run
    // (Panel.scala's no-stable-row-order rule); struct ordering is
    // lexicographic on (time, values…), so the pick is total
    val w = Window.partitionBy(entity.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__row").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__row", last(col("__row"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) =>
        val stale = col("__row").isNull ||
          (col("__t").cast("long") - col("__row.__mt").cast("long")) > tol
        carried.withColumn("__row", when(stale, lit(null).cast(rowType))
          .otherwise(col("__row")))
      case None => carried
    }
    val unpacked = valueCols.foldLeft(matched)((d, c) =>
      d.withColumn(c, col(s"__row.$c")))
    unpacked.select((lCols ++ valueCols).map(col): _*)
  }
}

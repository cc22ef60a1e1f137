package graft

import graft.core.Panel
import graft.operators.{CrossValidation, Forecasters, Metrics}
import org.apache.spark.sql.functions._

/** SURVEY.md §7.3 minimal end-to-end slice — the reference README
  * quickstart (README.md:70-96) on the real commodities panel:
  * read parquet → train/test split → seasonal-naive forecast → MASE.
  * Exercises scan, per-entity windowed slicing, future ranges,
  * group-by aggregation, joins, and per-entity scoring. */
class QuickstartSpec extends SparkSpec {

  test("commodities quickstart: split -> snaive -> mase end-to-end") {
    val path = "/root/reference/data/commodities.parquet"
    assume(new java.io.File(path).exists())
    // TIMESTAMP(NANOS) parquet arrives as long under nanosAsLong —
    // convert to µs TimestampType like core.Tables does
    val raw = spark.read.parquet(path)
    val timeCol =
      if (raw.schema("time").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros((col("time") / 1000).cast("long"))
      else col("time")
    val y = raw.select(col("commodity_type").as("entity"),
      timeCol.as("time"), col("price").as("value"))
    val p = Panel(y, Seq("entity"), Seq("time"), "value")

    val (train, test) = CrossValidation.trainTestSplit(p, testSize = 3)
    assert(train.count() + test.count() == 47583)
    assert(test.groupBy("entity").count().agg(max("count")).collect()(0).getLong(0) == 3)

    val pTrain = Panel(train, Seq("entity"), Seq("time"), "value")
    val yPred = Forecasters.snaive(pTrain, "time", fh = 3, sp = 12, freq = "1mo")
    assert(yPred.count() == 71 * 3)

    // MASE vs the held-out rows (sp=12 in-sample naive denominator).
    // Align pred↔test on (entity, horizon index) — a handful of series
    // have month-end-irregular timestamps, the exact positional-zip
    // hazard SURVEY.md §7.5(2) calls out; the explicit horizon key is
    // the robust form.
    import org.apache.spark.sql.expressions.Window
    val wh = Window.partitionBy(col("entity")).orderBy(col("time"))
    val testH = test.withColumn("__hj", row_number().over(wh))
    val predH = yPred.withColumn("__hj", row_number().over(wh))
      .withColumnRenamed("value", "pred").drop("time")
    val j = Metrics.aligned(testH, predH, Seq("entity", "__hj"), "value", "pred")
    val matched = j.filter(col("__p").isNotNull).count()
    assert(matched == 71 * 3, s"pred/test horizon alignment: $matched of ${71 * 3}")
    val mase = Metrics.mase(j, train, Seq("entity"), Seq("time"), "value", sp = 12)
    val mean = mase.agg(avg("mase")).collect()(0).getDouble(0)
    // finite sanity bound: seasonal-naive on commodity prices should
    // land in the low single digits of scaled error
    assert(!mean.isNaN && mean > 0 && mean < 10, s"mean MASE $mean")
  }
}
package graft

import graft.core.Panel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Plan evidence for the r14 `spark.sql.codegen.maxFields` fix: builds
  * the exact aggregate SHAPE of TreeBoost's pass B (4 conditional
  * aggregates per (feature, threshold) candidate — 196 output fields
  * at lags=7, bins=8) over the events reduction and dumps its physical
  * plan at maxFields=100 (the default, where the >100-field aggregate
  * is ejected from whole-stage codegen) and at the bench's raised
  * value. Run: `runMain graft.GbtPassPlan <outDir> [sfDir]`. */
object GbtPassPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off HERE ONLY (PlanAudit's convention): an unexecuted
      // AdaptiveSparkPlan hides the codegen-id annotations this plan
      // evidence exists to show — Bench keeps AQE on
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val p = Panel.events(spark, sfDir)
    val lags = 7; val bins = 8
    val featureCols = (1 to lags).map(l => s"${p.value}__lag_$l")
    val train = graft.operators.Forecasters.makeReduction(p, lags)
      .na.drop(featureCols :+ p.value)
      .select((featureCols :+ p.value).map(col): _*)
      .withColumn("__r", col(p.value) - lit(0.0))
      .withColumn("__gl", col(featureCols.head) <= lit(0.0))
      .withColumn("__gr", col(featureCols.head) > lit(0.0))
    val cands = for { i <- 1 to lags; k <- 1 until bins } yield (i, k)
    val r = col("__r"); val gl = col("__gl"); val gr = col("__gr")
    val aggsB = cands.flatMap { case (i, k) =>
      val c = col(featureCols(i - 1)) <= lit(k.toDouble)
      Seq(sum(when(gl && c, r)), count(when(gl && c, lit(1))),
          sum(when(gr && c, r)), count(when(gr && c, lit(1))))
    }
    Seq("100" -> "before", spark.conf.getOption("spark.sql.codegen.maxFields")
      .filter(_ != "100").getOrElse("1024") -> "after").foreach {
      case (maxFields, tag) =>
        spark.conf.set("spark.sql.codegen.maxFields", maxFields)
        val agg = train.agg(aggsB.head, aggsB.tail: _*)
        val plan = agg.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val path = s"$outDir/fc_gbt_passB_$tag.txt"
        Files.writeString(Paths.get(path),
          s"spark.sql.codegen.maxFields = $maxFields\n\n" + plan)
        println(s"[gbtpassplan] wrote $path")
    }
    spark.stop()
  }
}

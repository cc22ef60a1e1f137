package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from
  * SURVEY.md §2 (features, preprocessing, CV, forecasters, metrics,
  * evaluation) or a training-data pipeline operator (dedup, text,
  * similarity, multimodal). Entries with SQL-expressible semantics
  * carry a DuckDB oracle in [[oracleSql]]; the rest get the driver's
  * rows-only check and are asserted in the ScalaTest suite.
  */
object SparkEntry {

  val registry: Map[String, Q] =
    FeatureQueries.all ++ PreprocessQueries.all ++ ForecastQueries.all ++
      PipelineQueries.all ++ AggQueries.all ++ ConformalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}

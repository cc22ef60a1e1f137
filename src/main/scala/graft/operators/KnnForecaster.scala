package graft.operators

import graft.core.Panel
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KNN forecaster — forecasting/knn.py:22 (sklearn KNeighborsRegressor
  * over the AR-reduction matrix), re-expressed for a cluster: MLlib has
  * no exact KNN, so neighbor search runs as a bucketed random-projection
  * LSH similarity join (`approxSimilarityJoin`) between the per-entity
  * query tails and the training reduction matrix — the classic
  * distributed ANN trick (shuffles on hash bucket, no driver loop; cf.
  * SURVEY.md §7.5(8)). Prediction = mean label of the k nearest
  * neighbors, one-step; multi-step via the recursive roll is possible
  * but the reference's KNN is one-shot per horizon frame too.
  */
object KnnForecaster {

  /** One-step-ahead KNN prediction per entity. */
  def predictOneStep(p: Panel, timeCol: String, freq: String, lags: Int, k: Int,
                     bucketLength: Double = 2.0): DataFrame = {
    val featureCols = (1 to lags).map(l => s"${p.value}__lag_$l").toArray
    val reduction = Forecasters.makeReduction(p, lags).na.drop(featureCols :+ p.value)
    val assembler = new VectorAssembler().setInputCols(featureCols).setOutputCol("__features")
    // unique row id: identical lag patterns must stay distinct rows —
    // approxSimilarityJoin dedups (rowA, rowB) pairs, which would
    // collapse repeated patterns and break k-neighbor multiplicity
    val train = assembler.transform(reduction)
      .select(col("__features").as("__tf"), col(p.value).as("__label"),
        monotonically_increasing_id().as("__rid"))
    // query = the newest lag-tail per entity (the state the next step
    // would be predicted from)
    val tail = p.df
      .withColumn("__rn_desc", row_number().over(
        Window.partitionBy(p.entityCols: _*).orderBy(p.orderCols.map(_.desc): _*)))
      .filter(col("__rn_desc") <= lags)
    val state = tail.groupBy(p.entityCols: _*).agg(
      collect_list(struct(col("__rn_desc"), p.x)).as("__s"),
      max(col(timeCol)).as("__cutoff"))
      .withColumn("__state", sort_array(col("__s")).getField(p.value))
    val queries = (1 to lags).foldLeft(state) { (d, l) =>
      d.withColumn(s"${p.value}__lag_$l", element_at(col("__state"), l))
    }
    val queryVec = assembler.transform(queries)
      .select((p.entityCols :+ col("__cutoff") :+ col("__features").as("__qf")): _*)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__tf").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(train)
    val joined = model.approxSimilarityJoin(
        train, queryVec.withColumnRenamed("__qf", "__tf"), Double.MaxValue, "__dist")
      .select(col("datasetB.*"), col("datasetA.__label").as("__label"), col("__dist"))
    val ranked = joined
      .withColumn("__nn", row_number().over(
        Window.partitionBy(p.entityCols: _*).orderBy(col("__dist"))))
      .filter(col("__nn") <= k)
    ranked.groupBy(p.entityCols: _*)
      .agg(avg(col("__label")).as(p.value), max(col("__cutoff")).as("__cutoff"))
      .withColumn("__h", lit(1))
      .withColumn(timeCol, Forecasters.futureTime(freq))
      .select((p.entityCols ++ Seq(col(timeCol), col(p.value))): _*)
  }
}
package graft

import graft.functions.Ols
import org.apache.spark.sql.functions._

/** One-pass closed-form OLS vs known coefficients. */
class OlsSpec extends SparkSpec {

  test("recovers exact coefficients of a noiseless linear relation") {
    import spark.implicits._
    val d = spark.range(200).select(
      (col("id") % 13).cast("double").as("x1"),
      (col("id") % 7).cast("double").as("x2"))
      .withColumn("y", lit(2.5) + col("x1") * 1.5 - col("x2") * 0.75)
    val (b0, w) = Ols.fit(d, Seq("x1", "x2"), "y")
    assert(math.abs(b0 - 2.5) < 1e-8, s"intercept $b0")
    assert(math.abs(w(0) - 1.5) < 1e-8 && math.abs(w(1) + 0.75) < 1e-8, w.toSeq.toString)
  }

  test("matches MLlib LinearRegression (normal solver) on noisy data") {
    import spark.implicits._
    val d = spark.range(500).select(col("id"),
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 100).as("x1"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double") / 100).as("x2"))
      .withColumn("y", col("x1") * 0.8 + col("x2") * -0.3 + lit(4.0) +
        pmod(xxhash64(col("id"), lit(2)), lit(100)).cast("double") / 1000)
      .drop("id").cache()
    val (b0, w) = Ols.fit(d, Seq("x1", "x2"), "y")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("f").transform(d)
    val m = new org.apache.spark.ml.regression.LinearRegression()
      .setSolver("normal").setFeaturesCol("f").setLabelCol("y").fit(assembled)
    assert(math.abs(b0 - m.intercept) < 1e-6, s"$b0 vs ${m.intercept}")
    (0 until 2).foreach(i =>
      assert(math.abs(w(i) - m.coefficients(i)) < 1e-6, s"w($i): ${w(i)} vs ${m.coefficients(i)}"))
  }

  test("collinear features fall back to the jittered solve, not a crash") {
    import spark.implicits._
    val d = spark.range(100).select(col("id").cast("double").as("x1"))
      .withColumn("x2", col("x1") * 2) // exactly collinear
      .withColumn("y", col("x1") * 3 + 1)
    val (b0, w) = Ols.fit(d, Seq("x1", "x2"), "y")
    // prediction x·w + b0 must still reproduce y even if the individual
    // weights are non-unique under collinearity
    val pred = b0 + w(0) * 10.0 + w(1) * 20.0
    assert(math.abs(pred - 31.0) < 1e-4, s"pred $pred")
  }
}

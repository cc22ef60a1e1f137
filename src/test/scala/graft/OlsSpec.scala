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

  test("elasticNetCD satisfies the lasso KKT optimality conditions") {
    import spark.implicits._
    val d = spark.range(400).select(
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 100).as("x1"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double") / 100).as("x2"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("double") / 100).as("x3"))
      .withColumn("y", col("x1") * 2.0 - col("x3") * 1.5 + lit(3.0))
      .cache()
    val alpha = 0.2
    val (b0, w) = Ols.elasticNetCD(d, Seq("x1", "x2", "x3"), "y", alpha,
      l1Ratio = 1.0, sweeps = 200)
    // KKT for min 1/(2n)‖y−b0−Xw‖² + α‖w‖₁: per coordinate the data
    // gradient gⱼ = (1/n)Σ(ŷ−y)xⱼ must equal −α·sign(wⱼ) where wⱼ≠0,
    // and |gⱼ| ≤ α where wⱼ=0; the intercept residual must average 0
    val rows = d.select("y", "x1", "x2", "x3").collect()
    val n = rows.length.toDouble
    val g = new Array[Double](3)
    var resid = 0.0
    rows.foreach { r =>
      val y = r.getDouble(0)
      val xs = Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val e = b0 + w.zip(xs).map { case (a, b) => a * b }.sum - y
      resid += e
      (0 until 3).foreach(j => g(j) += e * xs(j) / n)
    }
    assert(math.abs(resid / n) < 1e-8, s"intercept gradient ${resid / n}")
    (0 until 3).foreach { j =>
      if (w(j) != 0.0)
        assert(math.abs(g(j) + alpha * math.signum(w(j))) < 1e-6,
          s"active coord $j: g=${g(j)} w=${w(j)}")
      else assert(math.abs(g(j)) <= alpha + 1e-8, s"inactive coord $j: g=${g(j)}")
    }
  }

  test("elasticNetCD: α→0 recovers OLS; large α zeroes weights and centers the intercept") {
    import spark.implicits._
    val d = spark.range(300).select(
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 100).as("x1"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double") / 100).as("x2"))
      .withColumn("y", col("x1") * 0.8 - col("x2") * 0.3 + lit(4.0))
      .cache()
    val (b0, w) = Ols.elasticNetCD(d, Seq("x1", "x2"), "y", alpha = 0.0,
      l1Ratio = 1.0, sweeps = 200)
    val (ob0, ow) = Ols.fit(d, Seq("x1", "x2"), "y")
    assert(math.abs(b0 - ob0) < 1e-6 && math.abs(w(0) - ow(0)) < 1e-6 &&
      math.abs(w(1) - ow(1)) < 1e-6, s"($b0, ${w.toSeq}) vs ($ob0, ${ow.toSeq})")
    val (zb0, zw) = Ols.elasticNetCD(d, Seq("x1", "x2"), "y", alpha = 1e6,
      l1Ratio = 1.0, sweeps = 10)
    assert(zw.forall(_ == 0.0), zw.toSeq.toString)
    val meanY = d.agg(avg("y")).collect()(0).getDouble(0)
    assert(math.abs(zb0 - meanY) < 1e-8, s"$zb0 vs mean $meanY")
    // L1 shrinkage is monotone in α on the l1-norm of the solution
    val norms = Seq(0.01, 0.1, 1.0).map { a =>
      Ols.elasticNetCD(d, Seq("x1", "x2"), "y", a, l1Ratio = 1.0, sweeps = 200)
        ._2.map(math.abs).sum
    }
    assert(norms == norms.sorted.reverse, norms.toString)
  }

  test("Logistic.fitIrls reaches the MLE score equations (gradient ≈ 0)") {
    import spark.implicits._
    // non-separable synthetic: label from a logistic probability
    // thresholded by a deterministic hash "uniform"
    val d = spark.range(2000).select(
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 500 - 1).as("x1"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double") / 500 - 1).as("x2"),
      (pmod(xxhash64(col("id"), lit(2)), lit(100000)).cast("double") / 100000).as("u"))
      .withColumn("pTrue",
        lit(1.0) / (lit(1.0) + exp(-(lit(0.5) + col("x1") * 2.0 - col("x2") * 1.0))))
      .withColumn("y", (col("u") < col("pTrue")).cast("double"))
      .drop("u", "pTrue").cache()
    val (b0, w) = graft.functions.Logistic.fitIrls(d, Seq("x1", "x2"), "y")
    // MLE first-order conditions: Σ (y − σ(b0 + w·x)) · [1, x] = 0
    val rows = d.collect()
    val g = new Array[Double](3)
    rows.foreach { r =>
      val (x1, x2, y) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val mu = 1.0 / (1.0 + math.exp(-(b0 + w(0) * x1 + w(1) * x2)))
      g(0) += y - mu; g(1) += (y - mu) * x1; g(2) += (y - mu) * x2
    }
    g.foreach(v => assert(math.abs(v / rows.length) < 1e-10, g.toSeq.toString))
    // and the fit recovers the generating coefficients to sampling error
    assert(math.abs(w(0) - 2.0) < 0.3 && math.abs(w(1) + 1.0) < 0.3 &&
      math.abs(b0 - 0.5) < 0.3, s"($b0, ${w.toSeq})")
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

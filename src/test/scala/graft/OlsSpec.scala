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

  // --- lassoLarsPath homotopy invariants (round-10 review fixes) ---

  private def hashN(t: Int, k: Double): Double = {
    val v = math.abs(math.sin(t * k) * 43758.5453)
    v - math.floor(v)
  }

  /** Fixture with a DROP event on its lasso path (f2 = 0.99·f1 +
    * noise makes f2 a proxy that enters early and is pushed back
    * through zero once f1 takes over — verified to drop). */
  private def dropFixture: (Array[Array[Double]], Array[Double], IndexedSeq[Array[Double]], IndexedSeq[Double]) = {
    val rows = (0 until 40).map { t =>
      val x1 = hashN(t, 12.9898)
      val x2 = 0.99 * x1 + 0.01 * hashN(t, 78.233)
      val x3 = hashN(t, 39.425)
      (Array(x1, x2, x3), 1.0 * x1 + 1.0 * x2 - 2.0 * x3 + 0.05 * hashN(t, 94.673))
    }
    val xs = rows.map(_._1)
    val ys = rows.map(_._2)
    val p = 3
    val n = rows.length
    // raw intercept-carrying moments (what cdFromMoments consumes)
    val a = Array.ofDim[Double](p + 1, p + 1)
    val b = new Array[Double](p + 1)
    rows.foreach { case (x, y) =>
      val xe = 1.0 +: x
      for (i <- 0 to p; j <- 0 to p) a(i)(j) += xe(i) * xe(j)
      for (i <- 0 to p) b(i) += xe(i) * y
    }
    (a, b, xs, ys)
  }

  test("lassoLarsPath: drop events produce lasso solutions and the path completes") {
    val (a, b, _, _) = dropFixture
    val p = 3
    val nn = a(0)(0)
    val cm = Array.tabulate(p, p)((j, k) => a(j + 1)(k + 1) - a(0)(j + 1) * a(0)(k + 1) / nn)
    val cv = Array.tabulate(p)(j => b(j + 1) - a(0)(j + 1) * b(0) / nn)
    val path = Ols.lassoLarsPath(cm, cv, nn)
    // the path must reach lambda = 0 (no guard truncation from a
    // join/drop cycle — the pre-fix failure mode)
    assert(path.last._1 < 1e-12 * path.head._1, s"path truncated at ${path.last._1}")
    // a drop occurred: some knot zeroes a previously-nonzero coef
    val dropped = path.sliding(2).exists { case Seq((_, w0), (_, w1)) =>
      (0 until p).exists(j => w0(j) != 0.0 && w1(j) == 0.0)
    }
    assert(dropped, s"fixture should contain a drop event: ${path.map(_._2.toSeq)}")
    // EVERY knot is a lasso solution — verified via the KKT
    // conditions directly (cyclic CD is no referee here: on the
    // 0.99-collinear pair it needs >>10^4 sweeps near the boundary):
    //   active j:   corr_j = λ·sign(w_j)  (stationarity)
    //   inactive j: |corr_j| ≤ λ          (subgradient bound)
    // The pre-fix join/drop cycle violated exactly these (a knot with
    // an inactive |corr_j| > λ after the bogus re-admission push).
    path.foreach { case (al, w) =>
      val lamRaw = al * nn
      val corr = Array.tabulate(p) { j =>
        var s = cv(j)
        var k = 0
        while (k < p) { s -= cm(j)(k) * w(k); k += 1 }
        s
      }
      val tol = 1e-8 * math.max(1.0, path.head._1 * nn)
      (0 until p).foreach { j =>
        if (w(j) != 0.0)
          assert(math.abs(corr(j) - lamRaw * math.signum(w(j))) <= tol,
            s"knot alpha=$al: active $j violates stationarity " +
              s"(corr=${corr(j)}, lam=$lamRaw, w=${w.toSeq})")
        else
          assert(math.abs(corr(j)) <= lamRaw + tol,
            s"knot alpha=$al: inactive $j violates |corr| <= lam " +
              s"(corr=${corr(j)}, lam=$lamRaw)")
      }
    }
  }

  test("lassoLarsIC survives duplicate regressors (singular active Gram)") {
    import spark.implicits._
    // two IDENTICAL member-forecast columns — the degenerate stack
    // input that must degrade gracefully (sklearn warns + drops),
    // never abort the elite forecast
    val df = (0 until 40).map { t =>
      val f = 10.0 + t + hashN(t, 12.9898) * 3
      (f, f, hashN(t, 39.425) * 5, 0.8 * f + 1.0 + hashN(t, 94.673))
    }.toDF("f_1", "f_2", "f_3", "__y")
    val (alpha, b0, w) = Ols.lassoLarsIC(df, Seq("f_1", "f_2", "f_3"), "__y")
    assert(java.lang.Double.isFinite(alpha) && java.lang.Double.isFinite(b0))
    // the duplicate pair contributes through at most one coefficient
    assert(w(0) == 0.0 || w(1) == 0.0, s"${w.toSeq}")
  }

  test("lassoLarsPath: innocent feature admitted in the same batch as a duplicate pair survives") {
    // exact-tie moments: features 0 and 1 are DUPLICATES, feature 2 is
    // orthogonal, and all three correlations equal the starting λ so
    // the batch admission takes them together. The culprit search must
    // exclude one of the duplicate pair — not feature 2, which the old
    // always-remove-active.last rule banned for the whole path
    // (ADVICE r10)
    val cm = Array(
      Array(1.0, 1.0, 0.0),
      Array(1.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val cv = Array(2.0, 2.0, 2.0)
    val path = Ols.lassoLarsPath(cm, cv, nn = 10.0)
    val wEnd = path.last._2
    assert(path.last._1 < 1e-12 * path.head._1, s"path truncated at ${path.last._1}")
    assert(wEnd(2) != 0.0, s"innocent feature excluded: ${wEnd.toSeq}")
    assert(wEnd(0) == 0.0 || wEnd(1) == 0.0, s"both duplicates active: ${wEnd.toSeq}")
    // the surviving pair solves G w = c exactly: w = (2, 0, 2) up to order
    assertClose(wEnd(0) + wEnd(1), 2.0, 1e-9)
    assertClose(wEnd(2), 2.0, 1e-9)
  }

  test("lassoLarsPath: NEAR-singular Gram (rounding-noise duplicates) is degraded, not exploded") {
    // f2 = f1 + O(1e-13): the Gram is not exactly singular, so the old
    // != 0.0 pivot test let it through to a ~1e13-magnitude direction;
    // the relative pivot tolerance must treat it as degenerate
    val d = 1e-13
    val cm = Array(
      Array(1.0, 1.0 - d, 0.0),
      Array(1.0 - d, 1.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val cv = Array(2.0, 2.0 - d, 1.0)
    val path = Ols.lassoLarsPath(cm, cv, nn = 10.0)
    assert(path.last._1 < 1e-9, s"path truncated at ${path.last._1}")
    path.foreach { case (_, w) =>
      assert(w.forall(v => math.abs(v) < 1e3),
        s"near-singular Gram produced an exploded knot: ${w.toSeq}")
    }
    val wEnd = path.last._2
    assert(wEnd(0) == 0.0 || wEnd(1) == 0.0, s"both near-duplicates active: ${wEnd.toSeq}")
  }

  test("lassoLarsIC zero-noise fallback picks the min-RSS knot instead of aborting") {
    import spark.implicits._
    // y is an EXACT linear function of f_1 — OLS residual 0, sigma2=0:
    // the criterion's sigma->0 limit is min RSS (first on ties)
    val df = (0 until 30).map { t =>
      val f1 = t.toDouble
      (f1, hashN(t, 39.425), 2.0 * f1 + 1.0)
    }.toDF("f_1", "f_2", "__y")
    val (alpha, b0, w) = Ols.lassoLarsIC(df, Seq("f_1", "f_2"), "__y")
    // the min-RSS knot is the path end: the exact fit itself
    assert(math.abs(b0 - 1.0) < 1e-6 && math.abs(w(0) - 2.0) < 1e-6,
      s"alpha=$alpha b0=$b0 w=${w.toSeq}")
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Conformal intervals, probabilistic metrics, scoreForecast,
  * deseasonalize round-trip, CWT peaks, and the tree/censored/direct
  * forecasters. */
class ConformalSpec extends SparkSpec {

  test("enbpi adds per-entity residual quantile per alpha (conformal.py:6-38)") {
    import spark.implicits._
    val yPred = Seq((0, 10, 5.0), (0, 11, 6.0)).toDF("entity", "t", "pred")
    val yResid = Seq((0, 1, -2.0), (0, 2, 0.0), (0, 3, 2.0)).toDF("entity", "t", "residual")
    val out = Conformal.enbpi(yPred, yResid, Seq("entity"), "t", "pred", "residual", Seq(0.5))
      .orderBy("t").collect()
    // median residual = 0 → pred unchanged; quantile column = 0.5
    assert(out.map(_.getDouble(2)).toSeq == Seq(5.0, 6.0))
    assert(out.forall(_.getDouble(3) == 0.5))
    // alpha 0: min residual −2 added
    val lo = Conformal.enbpi(yPred, yResid, Seq("entity"), "t", "pred", "residual", Seq(0.0))
      .orderBy("t").collect()
    assert(lo.map(_.getDouble(2)).toSeq == Seq(3.0, 4.0))
  }

  test("enbpi: a cold-start entity (no residuals) still fans out per alpha with null bands") {
    import spark.implicits._
    val yPred = Seq((0, 10, 5.0), (1, 10, 7.0)).toDF("entity", "t", "pred")
    val yResid = Seq((0, 1, -2.0), (0, 2, 2.0)).toDF("entity", "t", "residual")
    val out = Conformal.enbpi(yPred, yResid, Seq("entity"), "t", "pred", "residual",
      Seq(0.1, 0.9)).collect()
    // entity 1 has no residual rows: one row PER ALPHA, null band value
    val e1 = out.filter(_.getInt(0) == 1)
    assert(e1.length == 2, s"expected 2 alpha rows for the cold entity, got ${e1.length}")
    assert(e1.forall(_.isNullAt(2)), "cold-entity band must be null")
    assert(e1.map(_.getDouble(3)).sorted.toSeq == Seq(0.1, 0.9))
  }

  test("conformalize alpha percent rounds, not truncates (0.29 -> 29)") {
    import spark.implicits._
    val yPred = Seq((0, 10, 5.0)).toDF("entity", "t", "pred")
    val bt = Seq.empty[(Int, Int, Double)].toDF("entity", "t", "pred")
    val yResid = Seq((0, 1, -1.0), (0, 2, 1.0)).toDF("entity", "t", "residual")
    val out = Conformal.conformalize(yPred, bt, yResid, Seq("entity"), "t", "pred",
      "residual", Seq(0.29, 0.57))
    assert(out.select("quantile").distinct().collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(29, 57), "0.29 * 100 = 28.999... must round to 29, not truncate to 28")
  }

  test("llm analyze prompt renders the sorted-wide markdown template (llm/api.py:38-76)") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = for (e <- Seq(2L, 1L); i <- 0 until 2)
      yield (e, new java.sql.Timestamp(t0.getTime + i * 86400000L), e * 10.0 + i)
    val p = graft.core.Panel(rows.toDF("entity", "ts", "value"), Seq("entity"), Seq("ts"), "value")
    val prompt = LlmPrompt.analyzePrompt(p, "ts", Seq(2L, 1L), "unit fixture")
      .collect()(0).getString(0)
    assert(prompt.startsWith("Analyze the following time series data in 8-10 bulletpoints." +
      " The context is: unit fixture."))
    // entity columns sorted ascending regardless of basket order
    assert(prompt.contains("| ts | 1 | 2 |"))
    assert(prompt.contains("| 2024-01-01 00:00:00 | 10.000000 | 20.000000 |"))
    assert(prompt.contains("| 2024-01-02 00:00:00 | 11.000000 | 21.000000 |"))
    assert(prompt.endsWith("{{ Insert unordered Markdown list here }}"))
    // freeform variant swaps task + footer
    val ff = LlmPrompt.analyzePrompt(p, "ts", Seq(1L), "unit fixture", "freeform")
      .collect()(0).getString(0)
    assert(ff.startsWith("Analyze the following time series data. The context is:"))
    assert(ff.endsWith("{{ Insert your response here }}"))
  }

  test("conformalize stacks backtest+final preds with base-100 alpha (conformal.py:41-74)") {
    import spark.implicits._
    val yPred = Seq((0, 10, 5.0)).toDF("entity", "t", "pred")
    val bt = Seq((0, 9, 4.0)).toDF("entity", "t", "pred")
    val yResid = Seq((0, 1, -1.0), (0, 2, 1.0)).toDF("entity", "t", "residual")
    val out = Conformal.conformalize(yPred, bt, yResid, Seq("entity"), "t", "pred", "residual",
      Seq(0.1, 0.9))
    assert(out.count() == 4) // 2 preds × 2 alphas
    assert(out.select("quantile").distinct().collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 90))
  }

  test("Gaussian CRPS matches the closed form at z=0 (probabilistic.py:62-68)") {
    import spark.implicits._
    val df = Seq((0, 0.0, 0.0, 1.0)).toDF("entity", "a", "mu", "sigma")
    val got = featVal(Metrics.crpsGaussian(df, Seq("entity"), "a", "mu", "sigma"), "crps")
    // z=0: σ(2φ(0) − 1/√π) = 2/√(2π) − 1/√π
    assertClose(got, 2.0 / math.sqrt(2 * math.Pi) - 1.0 / math.sqrt(math.Pi), 1e-6)
  }

  test("winkler score penalizes outside-interval points (probabilistic.py:131)") {
    import spark.implicits._
    val df = Seq(
      (0, 5.0, 4.0, 6.0),   // inside: width 2
      (0, 3.0, 4.0, 6.0)    // below by 1: width 2 + 2/0.2·1 = 12
    ).toDF("entity", "a", "lower", "upper")
    val got = featVal(Metrics.winklerScore(df, Seq("entity"), "a", "lower", "upper", 0.2),
      "winkler_score")
    assertClose(got, (2.0 + 12.0) / 2)
  }

  test("scoreForecast columns agree with the individual metrics (multi_objective.py:61)") {
    import spark.implicits._
    val yTrue = Seq((0, 0, 10.0), (0, 1, 20.0), (0, 2, 30.0)).toDF("entity", "t", "actual")
    val yPred = Seq((0, 0, 12.0), (0, 1, 18.0), (0, 2, 33.0)).toDF("entity", "t", "pred")
    val j = Metrics.aligned(yTrue, yPred, Seq("entity", "t"), "actual", "pred")
    val sf = Metrics.scoreForecast(j, yTrue, Seq("entity"), Seq("t"), "actual", 1)
    assertClose(featVal(sf, "mae"), featVal(Metrics.mae(j, Seq("entity")), "mae"))
    assertClose(featVal(sf, "rmse"), featVal(Metrics.rmse(j, Seq("entity")), "rmse"))
    assertClose(featVal(sf, "smape"), featVal(Metrics.smape(j, Seq("entity")), "smape"))
    // mase denominator: naive lag-1 mae on yTrue = mean(|10|,|10|) = 10
    assertClose(featVal(sf, "mase"), featVal(Metrics.mae(j, Seq("entity")), "mae") / 10.0)
  }

  test("deseasonalizeFourier removes a pure Fourier seasonal and inverts exactly") {
    val sp = 8
    val signal = (0 until 64).map(t =>
      5.0 + 3.0 * math.cos(2 * math.Pi * (t % sp).toDouble / sp) +
        1.5 * math.sin(2 * math.Pi * (t % sp).toDouble / sp))
    val p = panel(signal)
    val (resid, artifact) = Seasonality.deseasonalizeFourier(p, sp, k = 2)
    // residual of an exactly-seasonal signal is ~0
    val maxAbs = resid.agg(max(abs(col("value")))).collect()(0).getDouble(0)
    assert(maxAbs < 1e-8, s"residual $maxAbs")
    // invert returns the original signal
    val rp = graft.core.Panel(resid, Seq("entity"), Seq("t"), "value")
    val back = Seasonality.deseasonalizeFourierInvert(rp, artifact, sp, k = 2)
      .orderBy("t").collect().map(_.getAs[Double]("value"))
    signal.zip(back).foreach { case (w, g) => assertClose(g, w, 1e-8) }
  }

  test("numberCwtPeaks counts well-separated bumps") {
    // two clear Gaussian bumps over a flat floor
    def bump(c: Int, t: Int) = math.exp(-math.pow((t - c) / 3.0, 2))
    val signal = (0 until 100).map(t => 10 * (bump(25, t) + bump(70, t)))
    assert(graft.functions.Kernels.numberCwtPeaks(signal.toArray, 5) == 2)
    // monotone ramp: no interior maxima (≤1 tolerates the boundary
    // artifact of 'same'-mode convolution, which scipy shows too)
    val ramp = (0 until 50).map(_.toDouble)
    assert(graft.functions.Kernels.numberCwtPeaks(ramp.toArray, 5) <= 1)
  }

  test("GBT recursive forecast is exact on a constant series") {
    val p = panel(Seq.fill(30)(42.0), Seq.fill(30)(7.0))
    val out = GbtForecaster.fit(p, lags = 3, freq = "1i", maxIter = 5)
      .predict(p, "t", fh = 4)
    assert(out.count() == 8)
    val v0 = out.filter(col("entity") === 0).collect().map(_.getAs[Double]("value"))
    v0.foreach(v => assertClose(v, 42.0, 1e-9))
  }

  test("GBT honors per-row sample weights (_regressors.py weight hook)") {
    import spark.implicits._
    // blocks 10,10,30: the lag-1 context "10" precedes BOTH a 10 and a
    // 30 (conflicting labels for one leaf), so the leaf value is the
    // weighted label mean — down-weighting the 30-label rows must pull
    // the forecast from ~20 toward 10. Series ends on a 10 so the
    // predict context hits that leaf.
    val series = Seq.tabulate(31)(t => if (t % 3 == 2) 30.0 else 10.0)
    val df = series.zipWithIndex.map { case (v, t) => (0L, t.toLong, v,
      if (v == 30.0) 1e-6 else 1.0) }.toDF("entity", "t", "value", "w")
    val p = graft.core.Panel(df, Seq("entity"), Seq("t"), "value")
    val down = GbtForecaster.fit(p, lags = 1, freq = "1i", maxIter = 5,
      weightCol = Some("w")).predict(p, "t", fh = 1)
      .collect()(0).getAs[Double]("value")
    val flat = GbtForecaster.fit(p, lags = 1, freq = "1i", maxIter = 5)
      .predict(p, "t", fh = 1).collect()(0).getAs[Double]("value")
    assert(down < flat - 5, s"weighted $down should sit well below unweighted $flat")
  }

  test("censored forecaster blends P(above)·ŷ (censored.py:32-96)") {
    // strictly positive series, threshold 0 → P≈1, predict ≈ linear AR
    val signal = (0 until 40).map(t => 50.0 + 10 * math.sin(0.3 * t))
    val p = panel(signal)
    val out = CensoredForecaster.fit(p, lags = 4, freq = "1i", threshold = 0.0)
      .predict(p, "t", fh = 3).collect()
    assert(out.length == 3)
    out.foreach(r => assert(!r.getAs[Double]("value").isNaN))
  }

  test("conformalize over the elite forecaster: bands exist and never cross") {
    // the reference's forecaster.conformalize composes with ANY
    // forecaster (base/forecaster.py:327-361; accuracy analog
    // test_forecasting.py:280-337) — here over EliteDeep with the
    // {naive, linear_7} zoo, asserting the ENBPI quantile bands are
    // non-crossing per (entity, time): q90 ≥ q10 always, because both
    // index the same sorted residual list
    import graft.operators.{Conformal, EliteDeep}
    val p = panel(Seq.tabulate(40)(i => 50.0 + i * 2.0 + (i % 3)),
      Seq.tabulate(40)(i => 80.0 - i * 0.5))
    def eliteFit(tr: graft.core.Panel, h: Int) =
      EliteDeep.run(tr, "t", "1i", fh = h, topK = 1, strategy = "mean",
        testSize = 4, nSplits = 2, stepSize = 4, sp = 3,
        models = Seq("naive", "linear_7"))
    val bt = Conformal.backtest(p, "t", testSize = 4, nSplits = 2, stepSize = 4,
      eliteFit _).localCheckpoint(true)
    val yPred = eliteFit(p, 3)
    val yResid = bt.withColumn("residual", col("actual") - col("pred"))
    val btPreds = bt.select(col("entity"), col("t"), col("pred").as("value"))
    val out = Conformal.conformalize(yPred, btPreds, yResid, Seq("entity"), "t",
      "value", "residual").collect()
    // (3 final + 8 backtest) preds × 2 bands × 2 entities
    assert(out.length == 44, s"got ${out.length}")
    val byKey = out.groupBy(r => (r.getInt(0), r.get(1)))
    byKey.foreach { case (k, rows) =>
      assert(rows.length == 2, s"$k: ${rows.length} bands")
      val lo = rows.find(_.getAs[Int]("quantile") == 10).get.getAs[Double]("value")
      val hi = rows.find(_.getAs[Int]("quantile") == 90).get.getAs[Double]("value")
      assert(hi >= lo, s"$k: band 90 ($hi) crosses band 10 ($lo)")
    }
  }

  test("direct linear strategy recovers per-horizon AR powers") {
    // x_t = 0.8·x_{t-1} exactly → horizon-h direct weight ≈ 0.8^h
    val signal = Iterator.iterate(100.0)(_ * 0.8).take(40).toSeq
    val p = panel(signal)
    val m = LinearForecaster.fitDirect(p, lags = 1, fh = 3, freq = "1i")
    val out = m.predict(p, "t", fh = 3).orderBy("t").collect().map(_.getAs[Double]("value"))
    val last = signal.last
    (1 to 3).foreach(h => assertClose(out(h - 1), last * math.pow(0.8, h), 1e-6))
  }
}

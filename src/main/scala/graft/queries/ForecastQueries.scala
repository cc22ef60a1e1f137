package graft.queries

import graft.operators.{CrossValidation, Forecasters, LinearForecaster, Metrics}
import org.apache.spark.sql.functions._
import Q._

/** SparkEntry registrations for forecasters, CV splitters, metrics and
  * evaluation (SURVEY.md §2.4-§2.7). Metric fixtures use the one-step
  * naive in-sample prediction (pred_t = value_{t-1}) so the oracle is
  * pure SQL. */
object ForecastQueries {

  /** yPred = lag(value) joined back on (user_id, event_id). */
  private def naivePred(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val p = ev(s, dir)
    val pred = p.df.withColumn("pred", lag(col("value"), 1).over(p.w))
      .select("user_id", "event_id", "pred")
    Metrics.aligned(p.df, pred, Seq("user_id", "event_id"), "value", "pred")
  }

  private val alignedSql =
    s"""SELECT user_id, value AS a, lag(value) OVER ($W) AS p FROM events"""

  val all: Map[String, Q] = Map(
    "m_mae" -> Q(
      s"""SELECT user_id, round(avg(abs(p - a)),6) AS mae FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.mae(naivePred(s, dir), Seq("user_id")))
    },

    "m_mfe" -> Q(
      s"""SELECT user_id, round(avg(p - a),6) AS mfe FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.mfe(naivePred(s, dir), Seq("user_id")))
    },

    "m_mape" -> Q(
      s"""SELECT user_id, round(avg(abs(a - p)/abs(a)),6) AS mape FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.mape(naivePred(s, dir), Seq("user_id")))
    },

    "m_mse" -> Q(
      s"""SELECT user_id, round(avg(pow(p - a, 2)),6) AS mse FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.mse(naivePred(s, dir), Seq("user_id")))
    },

    "m_rmse" -> Q(
      s"""SELECT user_id, round(sqrt(avg(pow(p - a, 2))),6) AS rmse FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.rmse(naivePred(s, dir), Seq("user_id")))
    },

    "m_smape" -> Q(
      s"""SELECT user_id, round(sum(abs(p - a))/sum(p + a),6) AS smape FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.smape(naivePred(s, dir), Seq("user_id")))
    },

    "m_smape_original" -> Q(
      s"""SELECT user_id, round(avg(CAST(200 AS DOUBLE) * abs(p - a) / (1e-15 + abs(a) + abs(p))),6)
            AS smape_original FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.smapeOriginal(naivePred(s, dir), Seq("user_id")))
    },

    "m_overforecast" -> Q(
      s"""SELECT user_id, round(sum(CASE WHEN p > a THEN p ELSE CAST(0 AS DOUBLE) END),6)
            AS overforecast FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.overforecast(naivePred(s, dir), Seq("user_id")))
    },

    "m_underforecast" -> Q(
      s"""SELECT user_id, round(sum(CASE WHEN p < a THEN p ELSE CAST(0 AS DOUBLE) END),6)
            AS underforecast FROM ($alignedSql) GROUP BY user_id""") {
      (s, dir) => r6(Metrics.underforecast(naivePred(s, dir), Seq("user_id")))
    },

    "m_mase" -> FuzzBuilders.mase(7),

    "m_rmsse" -> FuzzBuilders.rmsse(7),

    "m_summarize_scores" -> Q(
      s"""WITH mae AS (SELECT user_id, avg(abs(p - a)) AS mae FROM ($alignedSql) GROUP BY user_id)
          SELECT round(avg(mae),6) AS mean, round(quantile_cont(mae, 0.5),6) AS median,
                 round(stddev_samp(mae),6) AS std, count(mae) AS n_entities
          FROM mae""") {
      (s, dir) => r6(Metrics.summarizeScores(Metrics.mae(naivePred(s, dir), Seq("user_id")), "mae"))
    },

    "cv_train_test_split" -> FuzzBuilders.cvTrainTestSplit(10),

    "cv_expanding_window" -> FuzzBuilders.cvExpandingWindow(nSplits = 3, testSize = 10, stepSize = 5),

    "cv_sliding_window" -> FuzzBuilders.cvSlidingWindow(windowSize = 20, nSplits = 3, testSize = 10, stepSize = 5),

    "fc_naive" -> FuzzBuilders.fcNaive(3),

    "fc_snaive" -> FuzzBuilders.fcSnaive(sp = 7, fh = 4),

    // closed-form OLS replicated end-to-end: pooled normal-equation
    // moments over the AR(7) reduction, unrolled 8x8 Cholesky, then
    // the 3-step recursive prediction per entity tail. rd6 absorbs
    // the engines' sub-ULP sum-order drift through the solve.
    "fc_linear" -> Q({
      val fs = (1 to 7).map(j => s"lag(value, $j) OVER w AS f$j").mkString(", ")
      val xs = "1.0" +: (1 to 7).map(j => s"f$j")
      def pred(h: Int) = {
        // state newest-first: [p_{h-1}.. p_1, t1.. t_{7-h+1}]
        val state = (h - 1 to 1 by -1).map(i => s"p$i") ++ (1 to 7 - h + 1).map(i => s"t$i")
        (s"a_0" +: state.zipWithIndex.map { case (t, i) => s"a_${i + 1} * $t" })
          .mkString("(", " + ", s") AS p$h")
      }
      s"""WITH lagd AS (
            SELECT user_id, ts, event_id, value, $fs
            FROM events WINDOW w AS ($W)),
          mom AS (SELECT ${olsMomentsSql(xs, "value")}
                  FROM lagd WHERE f7 IS NOT NULL),
          ${cholSolveSql(8, "mom")},
          sol AS (SELECT * FROM ${cholSolveLast(8)}),
          tail AS (SELECT user_id, ts AS cutoff, value AS t1, f1 AS t2, f2 AS t3,
                          f3 AS t4, f4 AS t5, f5 AS t6, f6 AS t7
                   FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rd FROM lagd)
                   WHERE rd = 1 AND f6 IS NOT NULL),
          pr AS (SELECT user_id, cutoff, ${pred(1)}, ${pred(2)}, ${pred(3)}
                 FROM tail CROSS JOIN sol)
          SELECT user_id, CAST(cutoff + h * INTERVAL '1 day' AS TIMESTAMP) AS ts,
                 round(CASE h WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END, 6) AS value
          FROM pr CROSS JOIN (SELECT unnest([1, 2, 3]) AS h)"""
    }) { (s, dir) =>
      val p = ev(s, dir)
      val model = LinearForecaster.fit(p, lags = 7, freq = "1d")
      r6(model.predict(p, "ts", fh = 3))
    },

    // sample-weighted fit — the reference's weight_transform hook
    // (_regressors.py:19-42, base/model.py:48): per-row weights enter
    // the normal equations as w·(xᵢ·xⱼ). The demo weighting is
    // inverse-age recency 1/(1 + age/14) built from in-engine
    // divisions only (a pow()-based exponential decay is NOT
    // bitwise-portable across engines; division is)
    "fc_linear_weighted" -> Q(
      s"""WITH ${OlsBacktestSql.lagdCte(7)},
          ${OlsBacktestSql.fullLinear("lw", 7, fh = 3,
             weight = "(1.0 / (1.0 + (cnt - rn) / 14.0))")}
          SELECT user_id, CAST(cutoff + h * INTERVAL '1 day' AS TIMESTAMP) AS ts,
                 round(CASE h WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END, 6) AS value
          FROM fp_lw CROSS JOIN (SELECT unnest([1, 2, 3]) AS h)""") { (s, dir) =>
      val p = ev(s, dir)
      val model = LinearForecaster.fitWeighted(p, lags = 7, freq = "1d",
        (rn, cnt) => lit(1.0) / (lit(1.0) + (cnt - rn) / lit(14.0)))
      r6(model.predict(p, "ts", fh = 3))
    },

    "e_acf" -> Q(
      s"""WITH b AS (SELECT user_id, value,
                            lag(value, 1) OVER ($W) AS l1,
                            lag(value, 2) OVER ($W) AS l2,
                            lag(value, 3) OVER ($W) AS l3 FROM events)
          SELECT user_id, round(corr(value, l1),6) AS acf_1,
                 round(corr(value, l2),6) AS acf_2,
                 round(corr(value, l3),6) AS acf_3
          FROM b GROUP BY user_id""") {
      (s, dir) =>
        val p = ev(s, dir)
        val d = p.df
          .withColumn("__l1", lag(col("value"), 1).over(p.w))
          .withColumn("__l2", lag(col("value"), 2).over(p.w))
          .withColumn("__l3", lag(col("value"), 3).over(p.w))
        r6(d.groupBy("user_id").agg(
          corr(col("value"), col("__l1")).as("acf_1"),
          corr(col("value"), col("__l2")).as("acf_2"),
          corr(col("value"), col("__l3")).as("acf_3")))
    },

    "e_normality" -> Q(
      s"""WITH b AS (SELECT user_id, value, avg(value) OVER ($WE) AS mu FROM events),
              m AS (SELECT user_id,
                      avg(pow(value - mu, 2)) AS m2,
                      avg(pow(value - mu, 3)) AS m3,
                      avg(pow(value - mu, 4)) AS m4
                    FROM b GROUP BY user_id)
          SELECT user_id, round(m3 / pow(m2, 1.5),6) AS skew,
                 round(m4 / pow(m2, 2) - 3,6) AS kurtosis
          FROM m""") {
      (s, dir) =>
        val p = ev(s, dir)
        val d = p.df.withColumn("__mu", avg(col("value")).over(p.we))
        r6(d.groupBy("user_id")
          .agg(avg(pow(col("value") - col("__mu"), 2)).as("m2"),
            avg(pow(col("value") - col("__mu"), 3)).as("m3"),
            avg(pow(col("value") - col("__mu"), 4)).as("m4"))
          .select(col("user_id"),
            try_divide(col("m3"), pow(col("m2"), 1.5)).as("skew"),
            (try_divide(col("m4"), pow(col("m2"), 2)) - 3).as("kurtosis")))
    },

    "e_rank_point_forecasts" -> Q(
      """WITH s AS (SELECT user_id, round(avg(value),6) AS mean_value FROM events GROUP BY user_id)
         SELECT user_id, mean_value,
                CAST(row_number() OVER (ORDER BY mean_value DESC, user_id) AS BIGINT) AS rnk
         FROM s""") {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val sdf = r6(tbl(s, dir, "events").groupBy("user_id").agg(avg("value").as("mean_value")))
        // a global leaderboard rank is inherently a global sort; the
        // input here is one row PER ENTITY (entity-count bounded), not
        // row-scale — the only partition-less window in the library
        sdf.withColumn("rnk",
          row_number().over(Window.orderBy(col("mean_value").desc, col("user_id"))).cast("long"))
    },

    // plot_comet data layer (plotting.py:288-338): per-entity smape of
    // the naive in-sample forecast vs train CV = var/mean, with the
    // global mean-line values; plot_entities data layer = counts
    "e_comet_data" -> Q(
      s"""WITH al AS ($alignedSql),
          s AS (SELECT user_id, sum(abs(p - a))/sum(p + a) AS smape FROM al GROUP BY user_id),
          c AS (SELECT user_id, var_samp(value)/avg(value) AS cv FROM events GROUP BY user_id),
          ms AS (SELECT avg(smape) AS mean_score FROM s),
          mc AS (SELECT avg(cv) AS mean_cv FROM c)
          SELECT s.user_id, round(s.smape,6) AS smape, round(c.cv,6) AS cv,
                 round(ms.mean_score,6) AS mean_score, round(mc.mean_cv,6) AS mean_cv
          FROM s JOIN c USING (user_id) CROSS JOIN ms CROSS JOIN mc
          WHERE s.smape IS NOT NULL AND c.cv IS NOT NULL""") {
      (s, dir) =>
        r6(graft.operators.Evaluation.cometData(naivePred(s, dir), ev(s, dir)))
    },

    "e_entity_counts" -> Q(
      """SELECT user_id, count(*) AS len FROM events GROUP BY user_id""") {
      (s, dir) => graft.operators.Evaluation.entityCounts(ev(s, dir))
    },

    // plot_forecasts' data layer (plotting.py:124-195): first-10
    // entities (the deterministic no-seed choice, _plotting.py:330),
    // last-20 actual rows tagged vs the naive one-step in-sample
    // forecast rows, one shared (entity, ts, value, series) schema
    "e_forecast_data" -> Q(
      s"""WITH ch AS (SELECT user_id FROM (SELECT DISTINCT user_id FROM events)
                      ORDER BY user_id LIMIT 10),
              a0 AS (SELECT e.user_id, e.ts, e.event_id, e.value
                     FROM events e JOIN ch USING (user_id)),
              at AS (SELECT user_id, ts, value, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
                     FROM a0),
              p0 AS (SELECT user_id, ts, event_id, lag(value) OVER ($W) AS pv FROM events),
              p1 AS (SELECT p0.user_id, p0.ts, p0.event_id, pv
                     FROM p0 JOIN ch USING (user_id) WHERE pv IS NOT NULL),
              pt AS (SELECT user_id, ts, pv, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
                     FROM p1)
          SELECT user_id, ts, round(value,6) AS value, 'Actual' AS series
          FROM at WHERE rnd <= 20
          UNION ALL
          SELECT user_id, ts, round(pv,6) AS value, 'Forecast' AS series
          FROM pt WHERE rnd <= 20""") {
      (s, dir) =>
        val p = ev(s, dir)
        val pred = p.copy(
          df = p.df.withColumn("__p", lag(p.x, 1).over(p.w))
            .filter(col("__p").isNotNull).drop(p.value),
          value = "__p")
        r6(graft.operators.Evaluation.forecastData(p, pred, "ts",
          numSeries = 10, numPoints = 20))
    },

    // plot_panel's data layer (plotting.py:65-123): first-10 entities,
    // last-20 rows each, tagged with the 1-based subplot grid position
    "e_panel_data" -> Q(
      s"""WITH ch AS (SELECT user_id, row_number() OVER (ORDER BY user_id) - 1 AS i
                      FROM (SELECT DISTINCT user_id FROM events)
                      ORDER BY user_id LIMIT 10),
              a0 AS (SELECT e.user_id, e.ts, e.event_id, e.value, ch.i
                     FROM events e JOIN ch USING (user_id)),
              at AS (SELECT user_id, ts, value, i, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
                     FROM a0)
          SELECT user_id, ts, round(value,6) AS value,
                 (i // 2 + 1)::BIGINT AS grid_row, (i % 2 + 1)::BIGINT AS grid_col
          FROM at WHERE rnd <= 20""") {
      (s, dir) =>
        val out = graft.operators.Evaluation.panelData(ev(s, dir), "ts",
          numSeries = 10, numPoints = 20, numCols = 2)
        out.select(col("user_id"), col("ts"),
          graft.queries.Q.rd6(col("value")).as("value"),
          col("grid_row").cast("long").as("grid_row"),
          col("grid_col").cast("long").as("grid_col"))
    },

    // plot_backtests' data layer (plotting.py:197-241): actuals
    // (split −1) + every naive backtest split's predictions
    "e_backtest_data" -> Q(
      s"""WITH b AS (SELECT user_id, ts, event_id, value, row_number() OVER ($W) AS rn,
                            count(*) OVER ($WE) AS cnt FROM events),
              ch AS (SELECT user_id FROM (SELECT DISTINCT user_id FROM events)
                     ORDER BY user_id LIMIT 10),
              bc AS (SELECT b.* FROM b JOIN ch USING (user_id)),
              s AS (SELECT i AS split FROM unnest([0, 1]) AS t(i)),
              j AS (SELECT bc.*, s.split, bc.cnt - (5 + (1 - s.split) * 5) AS te
                    FROM bc CROSS JOIN s),
              lastv AS (SELECT user_id, split, value AS pred FROM j WHERE rn = te),
              test AS (SELECT user_id, split, ts FROM j
                       WHERE rn > te AND rn <= te + 5),
              bt AS (SELECT t.user_id, t.ts, t.split, l.pred
                     FROM test t JOIN lastv l
                       ON t.user_id = l.user_id AND t.split = l.split),
              at AS (SELECT user_id, ts, value, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd
                     FROM bc)
          SELECT user_id, ts, -1 AS split, round(value,6) AS value, 'Actual' AS series
          FROM at WHERE rnd <= 20
          UNION ALL
          SELECT user_id, ts, split, round(pred,6) AS value, 'Forecast' AS series
          FROM bt""") {
      (s, dir) =>
        val p = ev(s, dir)
        val bt = graft.operators.AutoForecast.backtestNaivePrefix(
          p, "ts", sp = 1, testSize = 5, nSplits = 2, stepSize = 5)
        // numPoints = testSize keeps every backtest row (same-timestamp
        // ties inside a split would otherwise make the trim ambiguous)
        r6(graft.operators.Evaluation.backtestData(p, bt, "ts",
          numSeries = 10, numPoints = 20))
    },

    // plot_residuals' data layer (plotting.py:243-285): per-entity
    // binned counts over a shared 20-bin global grid between the
    // residuals' exact min/max
    "e_residuals_data" -> Q(
      s"""WITH r0 AS (SELECT user_id, value - lag(value) OVER ($W) AS r FROM events),
              r1 AS (SELECT user_id, r FROM r0 WHERE r IS NOT NULL),
              mm AS (SELECT min(r) AS mn, max(r) AS mx FROM r1),
              bnd AS (SELECT user_id,
                        CAST(CASE WHEN mx = mn THEN 0
                             ELSE least(floor((r - mn) / ((mx - mn) / CAST(20 AS DOUBLE))), 19)
                             END AS BIGINT) AS bin,
                        mn, mx
                      FROM r1 CROSS JOIN mm)
          SELECT user_id, bin,
                 round(min(mn + bin * ((mx - mn) / CAST(20 AS DOUBLE))),6) AS bin_lo,
                 count(*) AS n
          FROM bnd GROUP BY user_id, bin""") {
      (s, dir) =>
        val p = ev(s, dir)
        val resids = p.df.withColumn("__r", p.x - lag(p.x, 1).over(p.w))
          .filter(col("__r").isNotNull).select(col("user_id"), col("__r"))
        val out = graft.operators.Evaluation.residualsData(
          resids, Seq("user_id"), "__r", nBins = 20)
        out.select(col("user_id"), col("bin"),
          graft.queries.Q.rd6(col("bin_lo")).as("bin_lo"), col("n"))
    },

    // plot_fva's data layer (plotting.py:340-398): per-entity
    // benchmark (snaive-7) score vs forecast (naive-1) score — one
    // scatter dot per row
    "e_fva_data" -> Q(
      s"""WITH j AS (SELECT user_id, value AS a, lag(value) OVER ($W) AS p,
                            lag(value, 7) OVER ($W) AS pb FROM events),
              s AS (SELECT user_id, sum(abs(p - a))/sum(p + a) AS m FROM j
                    WHERE p IS NOT NULL GROUP BY user_id),
              sb AS (SELECT user_id, sum(abs(pb - a))/sum(pb + a) AS mb FROM j
                     WHERE pb IS NOT NULL GROUP BY user_id)
          SELECT s.user_id, round(sb.mb,6) AS benchmark_score,
                 round(s.m,6) AS forecast_score
          FROM s LEFT JOIN sb ON s.user_id = sb.user_id""") {
      (s, dir) =>
        val p = ev(s, dir)
        def aligned(lagN: Int) = p.df
          .withColumn("p", lag(col("value"), lagN).over(p.w))
          .filter(col("p").isNotNull)
          .withColumn("a", col("value"))
        val smape = (df: org.apache.spark.sql.DataFrame, e: Seq[String]) =>
          df.groupBy(e.map(col): _*)
            .agg(try_divide(sum(abs(col("p") - col("a"))), sum(col("p") + col("a"))).as("m"))
        r6(graft.operators.Evaluation.fvaData(
          aligned(1), aligned(7), Seq("user_id"), smape, "m"))
    },

    "e_ljung_box" -> Q(
      s"""WITH b AS (SELECT user_id, value,
                            lag(value, 1) OVER ($W) AS l1,
                            lag(value, 2) OVER ($W) AS l2 FROM events),
              r AS (SELECT user_id, count(value) AS n,
                           corr(value, l1) AS r1, corr(value, l2) AS r2
                    FROM b GROUP BY user_id)
          SELECT user_id,
                 round(n * (n + CAST(2 AS DOUBLE)) * (r1*r1/(n-1) + r2*r2/(n-2)),6) AS q_stat
          FROM r""") {
      (s, dir) => r6(graft.operators.Evaluation.ljungBox(ev(s, dir), maxLags = 2))
    }
  )
}

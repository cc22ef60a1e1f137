package graft.queries

/** DuckDB-SQL generators replicating the closed-form linear backtest /
  * predict machinery ([[graft.operators.AutoForecast]],
  * [[graft.operators.LinearForecaster]]) for the correctness oracle.
  *
  * All fragments assume a CTE `lagd` is in scope with columns
  * `user_id, ts, value, f1..f<maxLag>` (fj = lag(value, j) over the
  * entity window), `rn` (1-based position) and `cnt` (series length).
  * Solves reuse [[Q.cholSolveSql]]'s staged-Cholesky chains; rd6
  * rounding on the final consumer absorbs the engines' sub-ULP
  * sum-order drift through the solves.
  */
object OlsBacktestSql {

  /** Recursive AR prediction for horizon h over solution columns
    * a_0..a_<lags> and tail columns t1..t<lags>: state(j) = p_{h-j}
    * for j < h (earlier horizons), else t_{j-h+1}. Mirrors the
    * foldLeft(bh)(+) order of predictRecursiveLinear. */
  private def predExpr(h: Int, lags: Int): String = {
    val terms = (1 to lags).map { j =>
      val s = if (j < h) s"p${h - j}" else s"t${j - h + 1}"
      s"a_$j * $s"
    }
    (s"a_0" +: terms).mkString("(", " + ", s") AS p$h")
  }

  /** Staged recursion: one MATERIALIZED CTE per horizon (lateral-alias
    * substitution nests the whole chain into one expression and blows
    * DuckDB's binder recursion limit at lags·horizons ≳ 128). `from0`
    * must carry t1..t<lags> and a_0..a_<lags>; the final CTE
    * `<p>pred` also carries p1..p<horizons>. */
  private def predStages(p: String, from0: String, horizons: Int, lags: Int): String = {
    val stages = (1 to horizons).map { h =>
      val src = if (h == 1) from0 else s"${p}h${h - 1}"
      s"${p}h$h AS MATERIALIZED (SELECT *, ${predExpr(h, lags)} FROM $src)"
    }
    (stages :+ s"${p}pred AS (SELECT * FROM ${p}h$horizons)").mkString(", ")
  }

  /** Tail CTE `<tag>_tail`: one row per entity long enough for a
    * `lags`-deep state ending at position `endRn` (SQL over lagd
    * columns), with t1 = newest state value. */
  private def tailCte(tag: String, lags: Int, endRn: String): String = {
    val ts = (1 to lags).map(j => if (j == 1) "value AS t1" else s"f${j - 1} AS t$j")
    val longEnough = if (lags == 1) "TRUE" else s"f${lags - 1} IS NOT NULL"
    s"""${tag}_tail AS (SELECT user_id, ts AS cutoff, ${ts.mkString(", ")}
          FROM lagd WHERE rn = $endRn AND $longEnough)"""
  }

  /** CTEs for one expanding-window linear backtest candidate: pooled
    * per-split OLS on the row-prefix (rn ≤ cnt − cutoff), recursive
    * predictions for h = 1..testSize, inner-joined to actuals.
    * Emits `bt_<tag>` with (user_id, h, split, actual, pred). */
  def backtestLinear(tag: String, lags: Int, testSize: Int, nSplits: Int,
                     stepSize: Int, ridge: Double = 0.0): String = {
    val xs = "1.0" +: (1 to lags).map(j => s"f$j")
    val splits = (0 until nSplits).map { i =>
      val cutoff = testSize + (nSplits - 1 - i) * stepSize
      val t = s"${tag}_s$i"
      val predCases = (1 to testSize)
        .map(h => s"WHEN $h THEN p.p$h").mkString(" ")
      s"""${t}_mom AS (SELECT ${Q.olsMomentsSql(xs, "value", ridge)}
            FROM lagd WHERE rn > $lags AND rn <= cnt - $cutoff),
          ${Q.cholSolveSql(lags + 1, s"${t}_mom", s"${t}_ch")},
          ${tailCte(s"$t", lags, s"cnt - $cutoff")},
          ${t}_p0 AS (SELECT * FROM ${t}_tail
            CROSS JOIN ${Q.cholSolveLast(lags + 1, s"${t}_ch")}),
          ${predStages(s"${t}_", s"${t}_p0", testSize, lags)},
          ${t}_bt AS (
            SELECT a.user_id, a.rn - (a.cnt - $cutoff) AS h, $i AS split,
                   a.value AS actual, CASE a.rn - (a.cnt - $cutoff) $predCases END AS pred
            FROM lagd a JOIN ${t}_pred p ON a.user_id = p.user_id
            WHERE a.rn > a.cnt - $cutoff AND a.rn <= a.cnt - $cutoff + $testSize)"""
    }
    val union = (0 until nSplits).map(i => s"SELECT * FROM ${tag}_s${i}_bt")
      .mkString(" UNION ALL ")
    (splits :+ s"bt_$tag AS ($union)").mkString(", ")
  }

  /** CTEs for the (seasonal-)naive expanding-window backtest: horizon
    * h's prediction is the train-slice value at position
    * trainEnd − sp + ((h−1) mod sp) + 1. Emits `bt_<tag>`. */
  def backtestNaive(tag: String, sp: Int, testSize: Int, nSplits: Int,
                    stepSize: Int): String = {
    val splits = (0 until nSplits).map { i =>
      val cutoff = testSize + (nSplits - 1 - i) * stepSize
      s"""${tag}_s${i}_bt AS (
            SELECT a.user_id, a.rn - (a.cnt - $cutoff) AS h, $i AS split,
                   a.value AS actual, pr.value AS pred
            FROM lagd a JOIN lagd pr
              ON a.user_id = pr.user_id
             AND pr.rn = (a.cnt - $cutoff) - $sp + ((a.rn - (a.cnt - $cutoff) - 1) % $sp) + 1
            WHERE a.rn > a.cnt - $cutoff AND a.rn <= a.cnt - $cutoff + $testSize)"""
    }
    val union = (0 until nSplits).map(i => s"SELECT * FROM ${tag}_s${i}_bt")
      .mkString(" UNION ALL ")
    (splits :+ s"bt_$tag AS ($union)").mkString(", ")
  }

  /** Per-entity SMAPE of a backtest frame: Σ|p−a| / Σ(p+a) (NULL on a
    * zero denominator in BOTH engines — Spark try_divide, DuckDB
    * double/0). Emits `sc_<tag>` with (user_id, smape). */
  def entityScore(tag: String): String =
    s"""sc_$tag AS (SELECT user_id,
          sum(abs(pred - actual)) / sum(pred + actual) AS smape
        FROM bt_$tag GROUP BY user_id)"""

  /** Full-data fit + fh-step recursive prediction for one lag count.
    * Emits `fp_<tag>` with (user_id, cutoff, p1..p<fh>). */
  def fullLinear(tag: String, lags: Int, fh: Int, ridge: Double = 0.0): String = {
    val xs = "1.0" +: (1 to lags).map(j => s"f$j")
    s"""${tag}_mom AS (SELECT ${Q.olsMomentsSql(xs, "value", ridge)}
          FROM lagd WHERE rn > $lags),
        ${Q.cholSolveSql(lags + 1, s"${tag}_mom", s"${tag}_ch")},
        ${tailCte(tag, lags, "cnt")},
        ${tag}_p0 AS (SELECT * FROM ${tag}_tail
          CROSS JOIN ${Q.cholSolveLast(lags + 1, s"${tag}_ch")}),
        ${predStages(s"${tag}_", s"${tag}_p0", fh, lags)},
        fp_$tag AS (SELECT * FROM ${tag}_pred)"""
  }

  /** Full-data elastic-net/lasso CD fit + fh-step recursive
    * prediction ([[graft.functions.Ols.elasticNetCD]]'s oracle).
    * Emits `fp_<tag>` with (user_id, cutoff, p1..p<fh>). */
  def fullElasticNet(tag: String, lags: Int, fh: Int, alpha: Double,
                     l1Ratio: Double, sweeps: Int): String = {
    val xs = "1.0" +: (1 to lags).map(j => s"f$j")
    s"""${tag}_mom AS (SELECT ${Q.olsMomentsSql(xs, "value")}
          FROM lagd WHERE rn > $lags),
        ${Q.cdSolveSql(lags, alpha, l1Ratio, sweeps, s"${tag}_mom", s"${tag}_cd")},
        ${tailCte(tag, lags, "cnt")},
        ${tag}_p0 AS (SELECT * FROM ${tag}_tail
          CROSS JOIN ${Q.cdSolveLast(lags, sweeps, s"${tag}_cd")}),
        ${predStages(s"${tag}_", s"${tag}_p0", fh, lags)},
        fp_$tag AS (SELECT * FROM ${tag}_pred)"""
  }

  /** Full-data DIRECT multi-horizon fit (_ar.py:53-73 oracle,
    * mirroring [[graft.operators.LinearForecaster.fitDirect]]): one
    * pooled OLS per horizon h over the lag window shifted by h
    * (features f_h..f_{h+lags−1}), every model trained on the shared
    * reduction with the first lags+fh−1 warmup rows dropped, all
    * scoring the same per-entity tail. Emits `fp_<tag>` with
    * (user_id, cutoff, p1..p<fh>). */
  def fullDirect(tag: String, lags: Int, fh: Int): String = {
    val maxLag = lags + fh - 1
    val moms = (1 to fh).map { h =>
      val xs = "1.0" +: (h until h + lags).map(j => s"f$j")
      s"""${tag}_mom$h AS (SELECT ${Q.olsMomentsSql(xs, "value")}
            FROM lagd WHERE rn > $maxLag)"""
    }
    val chains = (1 to fh).map(h =>
      Q.cholSolveSql(lags + 1, s"${tag}_mom$h", s"${tag}_c$h"))
    val sols = (1 to fh).map { h =>
      val renames = (0 to lags).map(i => s"a_$i AS w${h}_$i").mkString(", ")
      s"${tag}_sol$h AS (SELECT $renames FROM ${Q.cholSolveLast(lags + 1, s"${tag}_c$h")})"
    }
    // ((w_1·t1 + w_2·t2 + …) + w_0): the foldLeft order of
    // DirectLinearModel.predict's reduce(_+_) + intercept
    def pred(h: Int) =
      (1 to lags).map(i => s"w${h}_$i * t$i").mkString("(", " + ", ")") + s" + w${h}_0"
    val solJoin = (1 to fh).map(h => s"${tag}_sol$h").mkString(" CROSS JOIN ")
    s"""${moms.mkString(", ")},
        ${chains.mkString(", ")},
        ${sols.mkString(", ")},
        ${tailCte(tag, lags, "cnt")},
        fp_$tag AS (SELECT user_id, cutoff,
            ${(1 to fh).map(h => s"${pred(h)} AS p$h").mkString(", ")}
          FROM ${tag}_tail CROSS JOIN $solJoin)"""
  }

  /** The shared `lagd` CTE over events: f1..f<maxLag>, rn, cnt. */
  def lagdCte(maxLag: Int): String = {
    val fs = (1 to maxLag).map(j => s"lag(value, $j) OVER w AS f$j").mkString(", ")
    s"""lagd AS (
          SELECT user_id, ts, event_id, value, $fs,
                 row_number() OVER w AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt
          FROM events WINDOW w AS (${Q.W}))"""
  }
}

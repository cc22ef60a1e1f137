package graft.operators

import graft.core.Panel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Depth-1 gradient-boosted stumps over the AR reduction — the
  * oracle-checkable member of the GBT forecaster family.
  *
  * Reference semantics: functime/forecasting/lightgbm.py:103-121
  * (gradient boosting over the lag-matrix reduction). The full-depth
  * MLlib ensemble ([[GbtForecaster]]) keeps its tree internals out of
  * SQL reach, so this variant pins every choice deterministic:
  * squared loss, leaf value = mean residual × learning rate, and
  * split candidates on a fixed uniform grid between each feature's
  * exact min/max (the histogram-binning idea, uniform instead of
  * quantile so both engines derive bit-identical thresholds from
  * bit-identical min/max). Each boosting round is ONE codegen'd
  * conditional-aggregation pass computing left-sums/counts for every
  * (feature, threshold) candidate; the argmax and leaf values are
  * driver arithmetic over that single collected row, mirrored
  * term-for-term by the DuckDB oracle's per-round CTEs
  * ([[graft.queries.OlsBacktestSql.fullStump]]).
  *
  * Scale design: `rounds` sequential scans of the cached reduction
  * (each a map-side partial agg, no shuffle beyond the lag window),
  * a collected row of ~2·lags·bins doubles per round, and a model of
  * `rounds` stumps broadcast into the recursive predict. No per-row
  * state, no driver loop over entities.
  */
object StumpBoost {

  /** One stump: feature index (1-based lag), threshold, left/right
    * leaf values (already scaled by the learning rate). */
  final case class Stump(feat: Int, thr: Double, vl: Double, vr: Double)

  final case class Model(b0: Double, stumps: Seq[Stump], lags: Int, freq: String) {
    def predict(p: Panel, timeCol: String, fh: Int): DataFrame =
      GbtForecaster.predictRecursiveModel(p, timeCol, fh, freq, lags, { feats =>
        // ((b0 + c1) + c2)… — the oracle's (b0 + c1 + c2 …) fold order
        stumps.foldLeft(b0)((acc, s) =>
          acc + (if (feats(s.feat - 1) <= s.thr) s.vl else s.vr))
      })
  }

  def fit(p: Panel, lags: Int, freq: String, rounds: Int = 5,
          bins: Int = 8, eta: Double = 0.3): Model = {
    val reduction = Forecasters.makeReduction(p, lags)
    val featureCols = (1 to lags).map(l => s"${p.value}__lag_$l")
    val train = reduction.na.drop(featureCols :+ p.value)
      .select((featureCols :+ p.value).map(col): _*).cache()
    try {
      // one pass: exact per-feature min/max (no float-order drift) +
      // the base prediction sum(y)/n — same expressions as the oracle
      val mmAggs = featureCols.flatMap(f => Seq(min(col(f)), max(col(f)))) ++
        Seq(sum(col(p.value)), count(lit(1)))
      val mmRow = train.agg(mmAggs.head, mmAggs.tail: _*).collect()(0)
      // count is the only aggregate that can't be null — check it
      // before touching the nullable min/max cells, so an empty frame
      // gets the same actionable error as Ols.fit / Logistic.fitIrls
      // instead of an opaque NPE from getDouble on a null aggregate
      if (mmRow.getLong(2 * lags + 1) == 0L)
        throw new IllegalArgumentException(
          s"stump-boost fit has no complete training rows (every entity " +
            s"shorter than lags=$lags, or all rows null in ${p.value})")
      val mins = Array.tabulate(lags)(i => mmRow.getDouble(2 * i))
      val maxs = Array.tabulate(lags)(i => mmRow.getDouble(2 * i + 1))
      val b0 = mmRow.getDouble(2 * lags) / mmRow.getLong(2 * lags + 1)
      // uniform-grid candidates: mn + k·(mx−mn)/bins, k = 1..bins−1 —
      // identical IEEE op order to the oracle's threshold expression
      val cands = for { i <- 1 to lags; k <- 1 until bins }
        yield (i, k, mins(i - 1) + k * (maxs(i - 1) - mins(i - 1)) / bins.toDouble)
      // fitted constants (b0, per-stump feature index / threshold /
      // leaves, candidate thresholds) enter through StableConst
      // reference objects + element_at, never inlined literals or
      // data-chosen column refs — the generated aggregate class then
      // depends only on (lags, bins, #stumps), so all rounds and
      // datasets share the classes Bench's tiny warmup precompiles
      // (same scheme as TreeBoost; values are bitwise identical, the
      // oracle is unaffected)
      import graft.functions.StableConst.{double => sd, int => si}
      val featsArr = array(featureCols.map(col): _*)
      var stumps = Vector.empty[Stump]
      (1 to rounds).foreach { _ =>
        val r = col(p.value) - stumps.foldLeft(sd(b0): Column)((acc, s) =>
          acc + when(element_at(featsArr, si(s.feat)) <= sd(s.thr),
            sd(s.vl)).otherwise(sd(s.vr)))
        val aggs = cands.flatMap { case (i, _, t) =>
          Seq(sum(when(col(featureCols(i - 1)) <= sd(t), r)),
              count(when(col(featureCols(i - 1)) <= sd(t), r)))
        } ++ Seq(sum(r), count(lit(1)))
        val row = train.agg(aggs.head, aggs.tail: _*).collect()(0)
        val st = row.getDouble(2 * cands.size)
        val nt = row.getLong(2 * cands.size + 1)
        val scored = cands.zipWithIndex.map { case ((i, k, t), ci) =>
          val sl = if (row.isNullAt(2 * ci)) 0.0 else row.getDouble(2 * ci)
          val nl = row.getLong(2 * ci + 1)
          // SSE-reduction gain for mean leaves; empty/full sides get a
          // finite sentinel (not NaN/−Inf — engines order those apart)
          val gain =
            if (nl > 0 && nl < nt) sl * sl / nl + (st - sl) * (st - sl) / (nt - nl)
            else -1e308
          (gain, i, k, t, sl, nl)
        }
        // argmax gain, ties to the lowest (feature, threshold) —
        // ORDER BY gain DESC, i, k LIMIT 1 in the oracle
        val (_, bi, _, bt, bsl, bnl) = scored.minBy { case (g, i, k, _, _, _) => (-g, i, k) }
        val vl = if (bnl > 0) bsl / bnl * eta else 0.0
        val vr = if (nt > bnl) (st - bsl) / (nt - bnl) * eta else 0.0
        stumps :+= Stump(bi, bt, vl, vr)
      }
      Model(b0, stumps, lags, freq)
    } finally train.unpersist(blocking = false)
  }
}

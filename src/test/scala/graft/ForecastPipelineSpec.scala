package graft

import graft.operators.{ForecastPipeline => FP}
import org.apache.spark.sql.functions._

/** Composed Forecaster with target-transform chaining — the
  * reference's fit-transforms / predict-auto-inverts contract
  * (base/forecaster.py:147-171, :271-275; chained-transform test:
  * tests/test_forecasting.py:339). */
class ForecastPipelineSpec extends SparkSpec {

  private def preds(df: org.apache.spark.sql.DataFrame, entity: Int = 0): Seq[Double] =
    df.filter(col("entity") === entity).orderBy("t").collect()
      .map(_.getAs[Double]("value")).toSeq

  test("scale -> diff -> linear predicts a trend and auto-inverts back to levels") {
    // two entities with different slopes/levels: the per-entity scale
    // artifact and diff anchor must both invert correctly
    val s0 = (0 until 60).map(t => 100.0 + 3.0 * t)
    val s1 = (0 until 60).map(t => -50.0 + 0.5 * t)
    val p = panel(s0, s1)
    val fp = FP.fit(p, "t", Seq(FP.scaleStep(), FP.diffStep()), FP.linear(3, "1i"))
    val out = fp.predict("t", fh = 3)
    // a linear trend diffs to a constant, so the inverted forecast
    // continues the exact line
    preds(out, 0).zip(Seq(280.0, 283.0, 286.0)).foreach {
      case (g, w) => assertClose(g, w, 1e-6)
    }
    preds(out, 1).zip(Seq(-20.0, -19.5, -19.0)).foreach {
      case (g, w) => assertClose(g, w, 1e-6)
    }
  }

  test("inverts run in reverse order: log1p -> scale chain") {
    // growth curve: log1p linearizes it; predict must invert scale
    // FIRST (inner step last applied), then log1p — wrong order would
    // exponentiate z-scores into garbage
    val s = (0 until 50).map(t => math.expm1(0.1 * t + 1.0))
    val p = panel(s)
    val fp = FP.fit(p, "t", Seq(FP.log1pStep, FP.scaleStep()), FP.linear(2, "1i"))
    val out = preds(fp.predict("t", fh = 2))
    val want = (50 until 52).map(t => math.expm1(0.1 * t + 1.0))
    out.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) / w < 1e-3, s"$g vs $w")
    }
  }

  test("seasonal diff future-invert anchors each phase lane on the last sp levels") {
    // period-3 seasonal + trend: diff(sp=3) removes the season; the
    // future invert must pick the RIGHT per-phase anchor
    val season = Seq(10.0, 40.0, 25.0)
    val s = (0 until 60).map(t => season(t % 3) + 2.0 * t)
    val p = panel(s)
    val fp = FP.fit(p, "t", Seq(FP.diffStep(order = 1, sp = 3)), FP.linear(3, "1i"))
    val out = preds(fp.predict("t", fh = 6))
    val want = (60 until 66).map(t => season(t % 3) + 2.0 * t)
    out.zip(want).foreach { case (g, w) => assertClose(g, w, 1e-6) }
  }

  test("order-2 diff inverts both iterations with their own anchors") {
    // quadratic: second difference is constant (2a)
    val s = (0 until 40).map(t => 5.0 + 1.5 * t + 0.25 * t * t)
    val p = panel(s)
    val fp = FP.fit(p, "t", Seq(FP.diffStep(order = 2)), FP.linear(2, "1i"))
    val out = preds(fp.predict("t", fh = 3))
    val want = (40 until 43).map(t => 5.0 + 1.5 * t + 0.25 * t * t)
    out.zip(want).foreach { case (g, w) => assertClose(g, w, 1e-5) }
  }
}

package graft

import graft.operators.Evaluation
import org.apache.spark.sql.functions._

/** D'Agostino-Pearson normality test + Bartlett ACF bounds. */
class EvaluationSpec extends SparkSpec {

  test("normality test accepts Gaussian, rejects skewed data (normaltest semantics)") {
    val rng = new scala.util.Random(42)
    val gaussian = Seq.fill(500)(rng.nextGaussian())
    // heavily right-skewed: exp of gaussian (lognormal)
    val skewed = Seq.fill(500)(math.exp(rng.nextGaussian() * 1.5))
    val out = Evaluation.normalityTest(panel(gaussian, skewed)).collect()
      .map(r => r.getInt(0) -> r).toMap
    val pGauss = out(0).getAs[Double]("p_value")
    val pSkew = out(1).getAs[Double]("p_value")
    assert(pGauss > 0.01, s"gaussian rejected: p=$pGauss")
    assert(pSkew < 1e-6, s"lognormal accepted: p=$pSkew")
    // k2 nonnegative, p in [0,1]
    out.values.foreach { r =>
      assert(r.getAs[Double]("k2_stat") >= 0)
      val p = r.getAs[Double]("p_value"); assert(p >= 0 && p <= 1)
    }
  }

  test("acf with Bartlett bounds: white noise inside, AR(1) lag-1 outside") {
    val rng = new scala.util.Random(7)
    val noise = Seq.fill(400)(rng.nextGaussian())
    val ar = noise.scanLeft(0.0)((prev, e) => 0.9 * prev + e).tail
    val out = Evaluation.acf(panel(noise, ar), maxLags = 2).collect()
      .map(r => r.getInt(0) -> r).toMap
    // white noise: |acf_1| within the CI band
    assert(math.abs(out(0).getAs[Double]("acf_1")) < out(0).getAs[Double]("ci_1"))
    // AR(0.9): lag-1 autocorrelation far outside the band
    assert(out(1).getAs[Double]("acf_1") > 0.8)
    assert(out(1).getAs[Double]("acf_1") > out(1).getAs[Double]("ci_1"))
    // Bartlett bound grows with lag (ci_2 >= ci_1)
    assert(out(1).getAs[Double]("ci_2") > out(1).getAs[Double]("ci_1"))
  }
}
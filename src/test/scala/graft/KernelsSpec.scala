package graft

import graft.functions.Kernels
import org.scalatest.funsuite.AnyFunSuite

/** Kernel goldens vs NumPy/SciPy-equivalent computations (generated
  * offline with the reference formulas; series = seeded normal). */
class KernelsSpec extends AnyFunSuite {

  val xs = Array(66.24, 43.88, 44.72, 39.27, 58.65, 26.98, 67.45, 42.39, 53.19, 47.51, 64.62, 29.4, 46.78, 46.16, 61.34, 39.0, 48.28, 41.22, 50.42, 55.83, 38.99, 61.45, 59.02, 55.02, 59.01, 43.16, 48.77, 40.64, 47.32, 55.3, 43.08, 46.03, 43.13, 41.55, 43.29, 49.87, 38.83, 52.34, 66.6, 57.42, 48.08, 41.12, 42.53, 66.92, 50.51, 43.63, 51.91, 71.0, 51.2, 56.17, 53.0, 46.48, 38.57, 46.51, 47.91, 55.87, 58.39, 59.31, 52.86, 58.85, 42.46, 62.53, 55.13, 47.02)

  def close(g: Double, w: Double, tol: Double = 1e-6): Unit =
    assert(math.abs(g - w) <= tol, s"expected $w got $g")

  test("rfft matches np.fft.rfft") {
    val (re, im) = Kernels.rfft(xs)
    close(re(0), 3212.11, 1e-6); close(im(0), 0.0)
    close(re(1), 35.141412, 1e-5); close(im(1), 58.380776, 1e-5)
    close(re(2), -30.803448, 1e-5); close(im(2), 39.531992, 1e-5)
    close(re(3), 78.151094, 1e-5); close(im(3), 19.292494, 1e-5)
    assert(re.length == 33)
  }

  test("rfft odd length") {
    val odd = xs.take(7)
    val (re, im) = Kernels.rfft(odd)
    // np.fft.rfft([66.24,43.88,44.72,39.27,58.65,26.98,67.45])
    close(re(0), odd.sum, 1e-9)
    assert(re.length == 4)
    // Parseval: sum|X|^2 over full spectrum == n * sum x^2
    val full = re.zip(im).map { case (r, i) => r * r + i * i }
    val total = full(0) + 2 * full.drop(1).sum // odd n: all non-DC doubled
    close(total, 7 * odd.map(v => v * v).sum, 1e-6)
  }

  test("welch PSD matches scipy defaults") {
    val p = Kernels.welchPsd(xs)
    close(p(0), 12.863738073, 1e-6)
    close(p(1), 84.285622276, 1e-6)
    close(p(2), 159.331953522, 1e-6)
    close(p(3), 300.603309594, 1e-6)
  }

  test("approximate entropy matches reference semantics") {
    close(Kernels.approximateEntropy(xs, 2, 0.5), 0.909500989, 1e-6)
  }

  test("sample entropy matches reference semantics") {
    close(Kernels.sampleEntropy(xs), 2.944438979, 1e-6)
  }

  test("AR(3) coefficients match np.linalg.lstsq") {
    val c = Kernels.arCoefficients(xs, 3)
    close(c(0), -0.122083773, 1e-6)
    close(c(1), 0.093293974, 1e-6)
    close(c(2), -0.156737286, 1e-6)
    close(c(3), 59.408482537, 1e-5)
  }

  test("ADF t-stat matches reference formula") {
    close(Kernels.adfStat(xs, 2), -9.261985219, 1e-6)
  }

  test("LZ76 matches the rust kernel semantics") {
    assert(Kernels.lempelZiv(xs.map(_ > 50.0)) == 21)
    // hand-traced through the greedy scan of feature_extractor.rs:19-33:
    // 1|0|01|11|10|110|00|010 → 8 distinct substrings
    val bits = "1001111011000010".map(_ == '1').toArray
    assert(Kernels.lempelZiv(bits) == 8)
  }

  test("boxcox MLE lambda matches grid search") {
    close(Kernels.boxcoxLambdaMle(xs), 0.796905, 1e-4)
  }

  test("normPpf matches standard normal quantiles") {
    close(Kernels.normPpf(0.5), 0.0, 1e-9)
    close(Kernels.normPpf(0.975), 1.959963985, 1e-7)
    close(Kernels.normPpf(0.84134474), 1.0, 1e-6)
    // low/high branches (p < 0.02425) and antisymmetry
    close(Kernels.normPpf(0.001), -3.090232306, 1e-7)
    close(Kernels.normPpf(0.999), -Kernels.normPpf(0.001), 1e-9)
  }

  test("boxcox pearsonr lambda: degenerate inputs stay deterministic, no crash") {
    // constant series: the correlation objective is NaN everywhere
    // (zero variance), so the golden walk takes the same NaN-guarded
    // branch every step in BOTH engines — an arbitrary but
    // deterministic λ, never an exception
    val c = Array.fill(50)(3.0)
    assert(Kernels.boxcoxLambdaPearsonr(c) == Kernels.boxcoxLambdaPearsonr(c))
    assert(!Kernels.boxcoxLambdaPearsonr(Array(2.0)).isNaN)
  }

  test("boxcox pearsonr lambda: log-normal data wants log, normal wants identity") {
    val rng = new scala.util.Random(7)
    val z = Array.fill(400)(rng.nextGaussian())
    // exp(z) is log-normal: the normalizing transform is log, λ ≈ 0
    val lmbLog = Kernels.boxcoxLambdaPearsonr(z.map(math.exp))
    assert(math.abs(lmbLog) < 0.15, s"log-normal λ should be ≈0, got $lmbLog")
    // z + 10 is already normal: λ ≈ 1 (identity up to affine)
    val lmbId = Kernels.boxcoxLambdaPearsonr(z.map(_ + 10.0))
    assert(math.abs(lmbId - 1.0) < 0.5, s"normal-data λ should be ≈1, got $lmbId")
  }

  test("cusum flags a mean shift and re-warms") {
    val s = Array.fill(30)(0.0).zipWithIndex.map { case (_, i) => math.sin(i * 0.1) * 0.1 } ++
      Array.fill(30)(10.0)
    val ev = Kernels.cusum(s, threshold = 5.0, warmupPeriod = 20, drift = 0.0)
    assert(ev.take(30).sum == 0, "no events before the shift")
    assert(ev.drop(30).sum >= 1, "shift detected")
    val firstEvent = ev.indexOf(1)
    assert(firstEvent >= 30 && firstEvent <= 35, s"event near the shift, got $firstEvent")
  }

  test("cusum on a constant warmup still fires on a later shift (Rust max/min NaN semantics)") {
    // sigma = 0 after a constant warmup: z = 0/0 = NaN while flat —
    // the Rust kernel's f64::max(NaN, 0) = 0 keeps the sums clean, so
    // the level shift (z = +Inf) must still fire. Java's math.max
    // would have poisoned the state with NaN forever.
    val s = Array.fill(25)(5.0) ++ Array.fill(5)(50.0)
    val ev = Kernels.cusum(s, threshold = 5.0, warmupPeriod = 20, drift = 0.0)
    assert(ev.take(25).sum == 0, "no events while flat")
    assert(ev.drop(25).sum >= 1, "shift after a zero-sigma warmup must fire")
  }

  test("ricker wavelet matches scipy formula") {
    val w = Kernels.ricker(5, 2.0)
    val amp = 2.0 / (math.sqrt(6.0) * math.pow(math.Pi, 0.25))
    close(w(2), amp, 1e-12) // center: mod=1, gauss=1
    close(w(0), amp * 0.0, 1e-12) // x=-2: 1 - 4/4 = 0
  }

  test("friedrich bin means + polyfit, hand-computed") {
    // alternating 0,1: bin means → (x=0, Δ=−1), (x=1, Δ=+1);
    // deg-1 polyfit through the two points: slope 2, intercept −1
    val series = Array.tabulate(100)(i => (i % 2).toDouble)
    val c = Kernels.friedrichCoefficients(series, 1, 2)
    close(c(0), 2.0, 1e-9); close(c(1), -1.0, 1e-9)
  }

  test("lstsq solves exact systems") {
    val rows = Array(Array(1.0, 1.0), Array(2.0, 1.0), Array(3.0, 1.0))
    val y = Array(3.0, 5.0, 7.0) // y = 2x + 1
    val c = Kernels.lstsq(rows, y)
    close(c(0), 2.0, 1e-10); close(c(1), 1.0, 1e-10)
  }
}

package graft.functions

import org.jtransforms.fft.DoubleFFT_1D

/** Pure per-series kernels backing the collect-based feature
  * aggregators — the JVM re-implementations of the reference's
  * Rust/SciPy hot paths (SURVEY.md §2.3 "lang" column). All are plain
  * Array[Double] => result so they unit-test without Spark.
  */
object Kernels {

  /** Lempel-Ziv 76 distinct-substring count of a thresholded bit
    * sequence — semantics of src/feature_extraction/feature_extractor.rs:9-35
    * (standard LZ76 scan: extend window while seen, else record+reset). */
  def lempelZiv(bits: Array[Boolean]): Int = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    var ind = 0
    var inc = 1
    val sb = new StringBuilder(bits.length)
    bits.foreach(b => sb.append(if (b) '1' else '0'))
    val s = sb.toString
    while (ind + inc <= bits.length) {
      val sub = s.substring(ind, ind + inc)
      if (seen.contains(sub)) inc += 1
      else { seen.add(sub); ind += inc; inc = 1 }
    }
    seen.size
  }

  /** Standardized CUSUM changepoint filter —
    * src/changepoint_detection/cusum.rs:33-93 state machine: warmup
    * re-estimates μ,σ after every detection; emits 1 and resets when
    * S⁺>τ or S⁻<−τ. */
  def cusum(xs: Array[Double], threshold: Double, warmupPeriod: Int, drift: Double): Array[Int] = {
    val events = new Array[Int](xs.length)
    var sPos = 0.0; var sNeg = 0.0
    var t = 0
    var mu = 0.0; var sigma = 0.0
    val obs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < xs.length) {
      val v = xs(i)
      if (t < warmupPeriod) {
        obs += v; events(i) = 0; t += 1
      } else {
        if (t == warmupPeriod) {
          mu = obs.sum / obs.length
          sigma = math.sqrt(obs.map(x => (x - mu) * (x - mu)).sum / obs.length)
          t += 1
        }
        val z = (v - mu) / sigma
        // Rust f64::max/min (cusum.rs:70-71) return the NON-NaN operand
        // — Java's math.max propagates NaN. The difference matters on a
        // zero-sigma (constant) warmup: z = 0/0 = NaN must leave the
        // sums at 0 (reference behavior — a later level shift gives
        // z = ±Inf and still fires), not poison them forever.
        val sp = sPos + z - drift
        val sn = sNeg + z + drift
        sPos = if (sp.isNaN) 0.0 else math.max(sp, 0.0)
        sNeg = if (sn.isNaN) 0.0 else math.min(sn, 0.0)
        if (sPos > threshold || sNeg < -threshold) {
          events(i) = 1; sPos = 0.0; sNeg = 0.0; t = 0; obs.clear()
        } else events(i) = 0
      }
      i += 1
    }
    events
  }

  /** rFFT (numpy layout): returns (real, imag) arrays of length n/2+1.
    * JTransforms realForward packs results; unpack to match np.fft.rfft. */
  def rfft(xs: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xs.length
    val a = xs.clone()
    new DoubleFFT_1D(n).realForward(a)
    val m = n / 2 + 1
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    re(0) = a(0); im(0) = 0.0
    if (n % 2 == 0) {
      var k = 1
      while (k < n / 2) { re(k) = a(2 * k); im(k) = a(2 * k + 1); k += 1 }
      re(n / 2) = a(1); im(n / 2) = 0.0
    } else {
      // odd-n JTransforms layout: Im[(n−1)/2] lives in a(1)
      var k = 1
      while (k <= (n - 1) / 2) {
        re(k) = a(2 * k)
        im(k) = if (2 * k + 1 < n) a(2 * k + 1) else a(1)
        k += 1
      }
    }
    (re, im)
  }

  /** Welch power spectral density, scipy.signal.welch defaults:
    * nperseg=min(n,256), hann (periodic), 50% overlap, constant
    * detrend, density scaling, one-sided (feature_extractors.py:1549). */
  def welchPsd(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    val nperseg = math.min(n, 256)
    val step = nperseg - nperseg / 2
    val win = Array.tabulate(nperseg)(k => 0.5 - 0.5 * math.cos(2 * math.Pi * k / nperseg))
    val winSS = win.map(w => w * w).sum
    val scale = 1.0 / winSS // fs = 1
    val m = nperseg / 2 + 1
    val acc = new Array[Double](m)
    var nSeg = 0
    var start = 0
    while (start + nperseg <= n) {
      val seg = xs.slice(start, start + nperseg)
      val mean = seg.sum / nperseg
      val d = Array.tabulate(nperseg)(i => (seg(i) - mean) * win(i))
      val (re, im) = rfft(d)
      var f = 0
      while (f < m) {
        var p = (re(f) * re(f) + im(f) * im(f)) * scale
        if (f != 0 && !(nperseg % 2 == 0 && f == m - 1)) p *= 2
        acc(f) += p
        f += 1
      }
      nSeg += 1
      start += step
    }
    acc.map(_ / math.max(nSeg, 1))
  }

  private def std(xs: Array[Double], ddof: Int): Double = {
    val n = xs.length
    val mu = xs.sum / n
    math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - ddof))
  }

  /** −Σp·ln p over a histogram of `bins` equal-width bins (the binned
    * entropy convention of feature_extractors.py:400-408). */
  def binnedEntropyOf(vals: Array[Double], bins: Int): Double = {
    val mn = vals.min; val mx = vals.max
    val w = 1e-12 + (mx - mn) / bins
    val counts = new Array[Long](bins + 1)
    vals.foreach(v => counts(math.floor((v - mn) / w).toInt) += 1)
    val n = vals.length.toDouble
    counts.filter(_ > 0).map { c => val p = c / n; -p * math.log(p) }.sum
  }

  /** Entropy of the binned Welch PSD — fourier_entropy
    * (feature_extractors.py:710-716). */
  def fourierEntropy(xs: Array[Double], bins: Int): Double = {
    val pxx = welchPsd(xs)
    val mx = pxx.max
    binnedEntropyOf(pxx.map(_ / mx), bins)
  }

  /** Chebyshev-ball neighbor counts over the m-embedding, shared by
    * ApEn/SampEn (feature_extractors.py:143-171 KD-tree port; brute
    * O(k²) — exact, fine for per-entity series). Counts INCLUDE self
    * (query_ball_point semantics). */
  private def chebyshevCounts(xs: Array[Double], m: Int, r: Double): Array[Int] = {
    val k = xs.length - m + 1
    val counts = new Array[Int](k)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < k) {
        var d = 0.0
        var t = 0
        while (t < m && d <= r) {
          val diff = math.abs(xs(i + t) - xs(j + t))
          if (diff > d) d = diff
          t += 1
        }
        if (d <= r) counts(i) += 1
        j += 1
      }
      i += 1
    }
    counts
  }

  /** ApEn(m, r·std) — feature_extractors.py:111-171. */
  def approximateEntropy(xs: Array[Double], m: Int, filteringLevel: Double,
                         scaleByStd: Boolean = true): Double = {
    if (xs.length < m + 1) return 0.0
    val r = if (scaleByStd) filteringLevel * std(xs, 1) else filteringLevel
    def phi(mm: Int): Double = {
      val k = xs.length - mm + 1
      // reference phi_m uses n1 = n - m + 1 rows for BOTH m and m+1
      // (data_mp1 takes n1-1 rows); replicate exactly:
      val counts = chebyshevCounts(xs, mm, r)
      counts.map(c => math.log(c.toDouble / k)).sum / k
    }
    // phi_m over n-m+1 windows, phi_{m+1} over n-m windows
    math.abs(phi(m) - phi(m + 1))
  }

  /** SampEn = ln(B/A) with r = ratio·std_pop —
    * feature_extractors.py:1478-1522. */
  def sampleEntropy(xs: Array[Double], ratio: Double = 0.2, m: Int = 2): Double = {
    if (xs.length < m) return Double.NaN
    val r = ratio * std(xs, 0)
    val b = chebyshevCounts(xs, m, r).map(_.toLong).sum - (xs.length - m + 1)
    val a = chebyshevCounts(xs, m + 1, r).map(_.toLong).sum - (xs.length - m)
    math.log(b.toDouble / a.toDouble)
  }

  /** Least squares via normal equations + Gaussian elimination with
    * partial pivoting — the reference's closed-form Cholesky rationale
    * (src/linalg/mod.rs:8-20: XᵀX is tiny). */
  def lstsq(xRows: Array[Array[Double]], y: Array[Double]): Array[Double] = {
    val p = xRows(0).length
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var i = 0
    while (i < xRows.length) {
      val row = xRows(i)
      var a = 0
      while (a < p) {
        xty(a) += row(a) * y(i)
        var b = 0
        while (b < p) { xtx(a)(b) += row(a) * row(b); b += 1 }
        a += 1
      }
      i += 1
    }
    solve(xtx, xty)
  }

  private[graft] def solve(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val p = v.length
    val a = m.map(_.clone())
    val b = v.clone()
    var col = 0
    while (col < p) {
      var piv = col
      var r = col + 1
      while (r < p) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = a(col)(col)
      r = col + 1
      while (r < p) {
        val f = a(r)(col) / d
        var c = col
        while (c < p) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](p)
    var r2 = p - 1
    while (r2 >= 0) {
      var s = b(r2)
      var c = r2 + 1
      while (c < p) { s -= a(r2)(c) * x(c); c += 1 }
      x(r2) = s / a(r2)(r2)
      r2 -= 1
    }
    x
  }

  /** AR(p) OLS coefficients [lag1..lagp, intercept] —
    * feature_extractors.py:262-305 (nulls→0 handled upstream). */
  def arCoefficients(xs: Array[Double], nLags: Int): Array[Double] = {
    val length = xs.length - nLags
    if (length <= nLags + 1) return Array.fill(nLags + 1)(Double.NaN)
    val rows = Array.tabulate(length) { t =>
      val row = new Array[Double](nLags + 1)
      var i = 1
      while (i <= nLags) { row(i - 1) = xs(nLags - i + t); i += 1 }
      row(nLags) = 1.0
      row
    }
    val y = xs.slice(nLags, nLags + length)
    lstsq(rows, y)
  }

  /** ADF t-statistic with n lags — feature_extractors.py:185-230:
    * regress Δy_t on [y_{t-1} level, Δy lags, 1]; t = β₀/se(β₀). */
  def adfStat(xs: Array[Double], nLags: Int): Double = {
    val n = xs.length
    val length = n - nLags - 1
    if (length <= nLags + 3) return Double.NaN
    val dy = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // columns: level y sliced (nLags, length), diffs sliced (nLags-i, length) for i=0..nLags, intercept
    val rows = Array.tabulate(length) { t =>
      val row = new Array[Double](nLags + 2)
      row(0) = xs(nLags + t)
      var i = 1
      while (i <= nLags) { row(i) = dy(nLags - i + t); i += 1 }
      row(nLags + 1) = 1.0
      row
    }
    val y = Array.tabulate(length)(t => dy(nLags + t))
    val coeffs = lstsq(rows, y)
    // residual mse with dof = length - p
    val p = nLags + 2
    var rss = 0.0
    var i = 0
    while (i < length) {
      var pred = 0.0
      var j = 0
      while (j < p) { pred += rows(i)(j) * coeffs(j); j += 1 }
      val e = y(i) - pred
      rss += e * e
      i += 1
    }
    val mse = rss / (length - p)
    val lvl = rows.map(_(0))
    val lvlMean = lvl.sum / length
    val ss = lvl.map(v => (v - lvlMean) * (v - lvlMean)).sum
    coeffs(0) / math.sqrt(mse / ss)
  }

  /** Ricker (Mexican-hat) wavelet — feature_extractors.py:23-31. */
  def ricker(points: Int, a: Double): Array[Double] = {
    val amp = 2.0 / (math.sqrt(3.0 * a) * math.pow(math.Pi, 0.25))
    Array.tabulate(points) { i =>
      val x = i - (points - 1) / 2.0
      val mod = 1.0 - (x * x) / (a * a)
      amp * mod * math.exp(-(x * x) / (2 * a * a))
    }
  }

  /** np.convolve(x, w, mode="same"). */
  def convolveSame(x: Array[Double], w: Array[Double]): Array[Double] = {
    val n = x.length; val m = w.length
    val full = new Array[Double](n + m - 1)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) { full(i + j) += x(i) * w(j); j += 1 }
      i += 1
    }
    val start = (m - 1) / 2
    full.slice(start, start + n)
  }

  /** CWT coefficients for Ricker widths — feature_extractors.py:589-627:
    * first nCoefficients positions, cycled over widths in order. */
  def cwtCoefficients(xs: Array[Double], widths: Seq[Int], nCoefficients: Int): Array[Double] = {
    val conv = widths.map { w =>
      val points = math.min(10 * w, xs.length)
      val wav = ricker(points, w).reverse
      convolveSame(xs, wav)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var idx = 0
    while (idx < math.min(nCoefficients, xs.length)) {
      widths.indices.foreach(wi => out += conv(wi)(idx))
      idx += 1
    }
    out.toArray
  }

  /** Friedrich coefficients — feature_extractors.py:725-774: qcut the
    * signal into equal-frequency bins, per-bin means of (signal, Δ),
    * polyfit(deg) — returned highest-degree-first like np.polyfit. */
  def friedrichCoefficients(xs: Array[Double], polyOrder: Int, nQuantiles: Int): Array[Double] = {
    val n = xs.length
    val delta = Array.tabulate(n)(i => if (i == 0) Double.NaN else xs(i) - xs(i - 1))
    // qcut: linear-interpolated quantile boundaries, intervals (b_{i-1}, b_i]
    val sorted = xs.sorted
    def quantile(q: Double): Double = {
      val pos = q * (n - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val bounds = (1 until nQuantiles).map(i => quantile(i.toDouble / nQuantiles)).toArray
    val bin = xs.map { v =>
      val idx = java.util.Arrays.binarySearch(bounds, v)
      if (idx >= 0) idx // v == boundary → interval (b_{i-1}, b_i]
      else -idx - 1
    }
    val sigSum = new Array[Double](nQuantiles); val sigN = new Array[Int](nQuantiles)
    val dSum = new Array[Double](nQuantiles); val dN = new Array[Int](nQuantiles)
    var i = 0
    while (i < n) {
      val b = bin(i)
      sigSum(b) += xs(i); sigN(b) += 1
      if (!delta(i).isNaN) { dSum(b) += delta(i); dN(b) += 1 }
      i += 1
    }
    val pts = (0 until nQuantiles).filter(b => sigN(b) > 0 && dN(b) > 0)
      .map(b => (sigSum(b) / sigN(b), dSum(b) / dN(b)))
    // Vandermonde least squares, highest degree first
    val rows = pts.map { case (s, _) =>
      Array.tabulate(polyOrder + 1)(j => math.pow(s, polyOrder - j))
    }.toArray
    val y = pts.map(_._2).toArray
    lstsq(rows, y)
  }

  /** Box-Cox MLE λ via golden-section over [-5, 5] — the per-entity λ
    * search of preprocessing.py:604-612 (scipy boxcox_normmax mle). */
  def boxcoxLambdaMle(xs: Array[Double]): Double = {
    val n = xs.length
    val sumLog = xs.map(math.log).sum
    def negLl(lmb: Double): Double = {
      val y =
        if (math.abs(lmb) < 1e-12) xs.map(math.log)
        else xs.map(x => (math.pow(x, lmb) - 1) / lmb)
      val mu = y.sum / n
      val v = y.map(t => (t - mu) * (t - mu)).sum / n
      -((lmb - 1) * sumLog - n / 2.0 * math.log(v))
    }
    goldenMin(negLl, -5.0, 5.0, 1e-9)
  }

  /** Inverse normal CDF — Acklam's 2003 rational approximation
    * (~1.15e-9 relative error; public-domain algorithm, coefficients
    * verbatim). Deterministic closed-form arithmetic, so the DuckDB
    * oracle can replicate it op-for-op. */
  def normPpf(p: Double): Double = {
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((-7.784894002430293e-03 * q + -3.223964580411365e-01) * q +
        -2.400758277161838e+00) * q + -2.549732539343734e+00) * q +
        4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q +
          2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1.0)
    } else if (p <= 1.0 - pl) {
      val q = p - 0.5
      val r = q * q
      (((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r +
        -2.759285104469687e+02) * r + 1.383577518672690e+02) * r +
        -3.066479806614716e+01) * r + 2.506628277459239e+00) * q /
        (((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r +
          -1.556989798598866e+02) * r + 6.680131188771972e+01) * r +
          -1.328068155288572e+01) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -((((((-7.784894002430293e-03 * q + -3.223964580411365e-01) * q +
        -2.400758277161838e+00) * q + -2.549732539343734e+00) * q +
        4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q +
          2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1.0))
    }
  }

  /** Box-Cox λ via Pearson correlation — preprocessing.py:577
    * `method="pearsonr"` (scipy boxcox_normmax pearsonr under the
    * reference's bounded optimizer on [-2, 2]): minimize 1 − r between
    * the Filliben order-statistic normal quantiles and the sorted
    * transformed sample. The transform is monotonic in x for every λ,
    * so sort(transform(x)) = transform(sort(x)). Shares the
    * golden-section scaffold with [[boxcoxLambdaMle]]. */
  def boxcoxLambdaPearsonr(xs: Array[Double]): Double = {
    val n = xs.length
    val sorted = xs.sorted
    val xv = Array.tabulate(n) { i0 =>
      val i = i0 + 1
      val u =
        if (i == n) math.pow(0.5, 1.0 / n)
        else if (i == 1) 1.0 - math.pow(0.5, 1.0 / n)
        else (i - 0.3175) / (n + 0.365)
      normPpf(u)
    }
    val xm = xv.sum / n
    def obj(lmb: Double): Double = {
      val y =
        if (math.abs(lmb) < 1e-12) sorted.map(math.log)
        else sorted.map(x => (math.pow(x, lmb) - 1) / lmb)
      val ym = y.sum / n
      var num = 0.0; var dx = 0.0; var dy = 0.0
      var i = 0
      while (i < n) {
        num += (xv(i) - xm) * (y(i) - ym)
        dx += (xv(i) - xm) * (xv(i) - xm)
        dy += (y(i) - ym) * (y(i) - ym)
        i += 1
      }
      1.0 - num / (math.sqrt(dx) * math.sqrt(dy))
    }
    goldenMin(obj, -2.0, 2.0, 1e-9)
  }

  /** Number of CWT-ridge peaks — feature_extractors.py:1187-1222
    * (scipy.signal.find_peaks_cwt semantics, re-derived): smooth with
    * Ricker wavelets for widths 1..maxWidth, link per-width relative
    * maxima into ridge lines (nearest column within width/4, gaps ≤ 2
    * rows), keep ridges spanning ≥ ¼ of the width scales whose
    * smallest-width SNR ≥ 1 vs the 10th percentile local noise floor. */
  def numberCwtPeaks(xs: Array[Double], maxWidth: Int): Int = {
    val n = xs.length
    if (n < 3) return 0
    val widths = (1 to maxWidth).toArray
    // cwt matrix: one smoothed row per width
    val cwt = widths.map { w =>
      val points = math.min(10 * w, n)
      convolveSame(xs, ricker(points, w).reverse)
    }
    def relMaxCols(row: Array[Double]): Array[Int] =
      (1 until n - 1).filter(i => row(i) > row(i - 1) && row(i) > row(i + 1)).toArray
    val gapThresh = 2
    // walk from the largest width down, linking maxima into ridges
    final case class Ridge(var rows: List[Int], var cols: List[Int], var gap: Int)
    var active = relMaxCols(cwt(widths.length - 1)).map(c =>
      Ridge(List(widths.length - 1), List(c), 0)).toBuffer
    val finished = scala.collection.mutable.ArrayBuffer.empty[Ridge]
    var r = widths.length - 2
    while (r >= 0) {
      active.foreach(_.gap += 1)
      val maxDist = math.max(widths(r) / 4.0, 1.0)
      relMaxCols(cwt(r)).foreach { c =>
        val cand = active.filter(l => math.abs(c - l.cols.head) <= maxDist)
        if (cand.nonEmpty) {
          val best = cand.minBy(l => math.abs(c - l.cols.head))
          best.rows ::= r; best.cols ::= c; best.gap = 0
        } else active += Ridge(List(r), List(c), 0)
      }
      val (dead, alive) = active.partition(_.gap > gapThresh)
      finished ++= dead; active = alive
      r -= 1
    }
    finished ++= active
    // filter: length and SNR at the ridge's smallest-width endpoint
    val minLength = math.ceil(widths.length / 4.0).toInt
    val noiseWindow = math.ceil(n / 20.0).toInt
    val row0 = cwt(0).map(math.abs)
    finished.count { ridge =>
      if (ridge.rows.size < minLength) false
      else {
        val col = ridge.cols.head
        val lo = math.max(0, col - noiseWindow)
        val hi = math.min(n, col + noiseWindow + 1)
        val window = row0.slice(lo, hi).sorted
        val noise = window(math.min(window.length - 1,
          math.max(0, math.round(0.10 * (window.length - 1)).toInt)))
        val snr = math.abs(cwt(ridge.rows.head)(col)) / math.max(noise, 1e-12)
        snr >= 1.0
      }
    }
  }

  private def goldenMin(f: Double => Double, lo0: Double, hi0: Double, tol: Double): Double = {
    val phi = (math.sqrt(5.0) - 1) / 2
    var lo = lo0; var hi = hi0
    var c = hi - phi * (hi - lo); var d = lo + phi * (hi - lo)
    var fc = f(c); var fd = f(d)
    while (hi - lo > tol) {
      if (fc < fd) { hi = d; d = c; fd = fc; c = hi - phi * (hi - lo); fc = f(c) }
      else { lo = c; c = d; fc = fd; d = lo + phi * (hi - lo); fd = f(d) }
    }
    (lo + hi) / 2
  }
}

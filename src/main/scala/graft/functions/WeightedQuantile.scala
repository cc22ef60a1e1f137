package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted interpolated quantile — the fractional-weight analog of
  * Spark's exact `percentile` / DuckDB's `quantile_cont`, which only
  * support integral frequencies. Completes the GBT family's
  * `weight_transform` hook (reference: _regressors.py:19-42) for the
  * quantile objective's leaf renewal (lightgbm.py:25-27 maps alpha →
  * objective="quantile").
  *
  * Rule (documented because conventions differ): sort the (value,
  * weight) pairs ascending by (value, weight); with S_j the ascending
  * prefix weight sum (S_0 = 0) and W = S_n, assign pair j the position
  *
  *   p_j = S_{j-1} / (W − w_n)
  *
  * (so p_1 = 0, p_n = 1, strictly increasing for positive weights),
  * then linearly interpolate between the pairs bracketing α:
  *
  *   Q_α = v_lo + (v_hi − v_lo) · (α − p_lo) / (p_hi − p_lo).
  *
  * Unit weights reduce this to p_j = (j−1)/(n−1) — exactly
  * `quantile_cont`'s positions, so the unweighted objective is the
  * w ≡ 1 special case (QuantileSpec asserts agreement; the
  * interpolation's op ORDER differs from `percentile`'s
  * pos − floor(pos) form by ≤2 ULP). Zero-weight
  * pairs are skipped on input (they contribute nothing to any Σw
  * statistic and would collapse p_j spacing); negative weights are the
  * CALLER's contract to reject (TreeBoost guards at fit time).
  *
  * The DuckDB oracle replicates the same arithmetic with window
  * functions (prefix sums over the same (value, weight) order and the
  * identical position/interpolation expressions) — rd6 absorbs the
  * engines' sub-ULP prefix-sum drift like every moment oracle.
  *
  * Buffer: unsorted interleaved [v0,w0, v1,w1, …], sorted once in
  * `finish` — memory O(pairs in the group), the same class as exact
  * `percentile`'s value→count map; at 100 TB the bounded-memory path
  * is TreeBoost's `quantileExact = false` (t-digest approx_percentile,
  * unweighted) — see TreeBoost.fit.
  */
object WeightedQuantile {

  /** The interpolation kernel over an UNSORTED interleaved pair
    * buffer; null for an empty buffer. Exposed for specs and the
    * driver-side uses. */
  def of(buf: Array[Double], alpha: Double): java.lang.Double = {
    val n = buf.length / 2
    if (n == 0) return null
    // sort pair indices by (value, weight); ties are identical pairs
    // up to weight, and equal values interpolate to themselves, so the
    // order among ties cannot change the result — the explicit weight
    // tiebreak just keeps the walk deterministic
    val idx = Array.range(0, n)
    val sorted = idx.sortBy(i => (buf(2 * i), buf(2 * i + 1)))
    if (n == 1) return buf(2 * sorted(0))
    val wLast = buf(2 * sorted(n - 1) + 1)
    var total = 0.0
    sorted.foreach(i => total += buf(2 * i + 1))
    val denom = total - wLast
    if (denom <= 0.0) return buf(2 * sorted(0)) // single positive-weight pair
    // walk ascending: p_j = S_{j-1} / denom, strictly increasing —
    // track the bracketing pair around alpha
    var cum = 0.0
    var vLo = 0.0; var pLo = 0.0
    var vHi = 0.0; var pHi = 0.0
    var found = false
    var j = 0
    while (j < n && !found) {
      val p = cum / denom
      val v = buf(2 * sorted(j))
      if (p <= alpha) { vLo = v; pLo = p }
      if (p >= alpha) { vHi = v; pHi = p; found = true }
      cum += buf(2 * sorted(j) + 1)
      j += 1
    }
    if (!found) { // alpha ≥ 1 boundary (p_n = 1): the max value
      vHi = buf(2 * sorted(n - 1)); pHi = 1.0
      if (pLo == pHi) return vLo
    }
    if (pLo == pHi) vLo
    else vLo + (vHi - vLo) * ((alpha - pLo) / (pHi - pLo))
  }
}

/** Aggregator form: rows are (value, weight); null values (e.g. a
  * `when(cond, d)` leaf gate) and non-positive weights are skipped;
  * an empty group yields null (callers coalesce — TreeBoost's empty
  * leaf → 0.0, like the unweighted renewal). */
final class WeightedQuantileAgg(alpha: Double)
    extends Aggregator[(java.lang.Double, java.lang.Double), Array[Double],
      java.lang.Double] with Serializable {
  require(alpha > 0.0 && alpha < 1.0, s"weighted quantile needs alpha in (0,1), got $alpha")

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(b: Array[Double], in: (java.lang.Double, java.lang.Double)): Array[Double] = {
    if (in._1 == null || in._2 == null || in._2.doubleValue <= 0.0) b
    else {
      val out = java.util.Arrays.copyOf(b, b.length + 2)
      out(b.length) = in._1.doubleValue
      out(b.length + 1) = in._2.doubleValue
      out
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = java.util.Arrays.copyOf(a, a.length + b.length)
    System.arraycopy(b, 0, out, a.length, b.length)
    out
  }

  override def finish(b: Array[Double]): java.lang.Double = WeightedQuantile.of(b, alpha)

  override def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object WeightedQuantileAgg {
  /** Two-column (value, weight) UDAF for DataFrame `agg`. */
  def apply(alpha: Double) = udaf(new WeightedQuantileAgg(alpha),
    Encoders.product[(java.lang.Double, java.lang.Double)])
}

package graft.queries

import graft.functions.FeatureAggs
import org.apache.spark.sql.functions._
import Q._

/** SparkEntry registrations for the collect-based (typed Aggregator)
  * features — the reference's Rust/SciPy kernels (SURVEY.md §2.3).
  * DuckDB cannot express these → rows-only driver check; numeric
  * parity is asserted against NumPy/SciPy goldens in KernelsSpec. */
object AggQueries {

  private def over(name: String, agg: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
    Q.rowsOnly { (s, dir) => r6(FeatureAggs.over(ev(s, dir), agg, name)) }

  /** Shared ordered-series CTE: one row per entity with the value list
    * (time order) and its length. */
  private val XS =
    """xs AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v,
                     len(list(value)) AS n FROM events GROUP BY user_id)"""

  // ---- string-generated linear algebra for the small-system oracles ----
  // The kernels solve tiny normal systems (Kernels.lstsq: XtX is 4x4 for
  // AR(3)/ADF(2)/Friedrich(3)); DuckDB has no matrix solve, so the
  // oracle expands Cramer's rule symbolically. Cramer vs the kernel's
  // pivoted elimination differ only in ULPs for these well-conditioned
  // systems — absorbed by the 6-dp rounding both sides apply.
  private def det3(m: Seq[Seq[String]]): String = {
    val Seq(Seq(a, b, c), Seq(d, e, f), Seq(g, h, i)) = m
    s"(($a)*(($e)*($i) - ($f)*($h)) - ($b)*(($d)*($i) - ($f)*($g)) " +
      s"+ ($c)*(($d)*($h) - ($e)*($g)))"
  }

  private def det4(m: Seq[Seq[String]]): String = {
    val terms = (0 until 4).map { j =>
      val minor = (1 until 4).map(r => (0 until 4).collect { case c if c != j => m(r)(c) })
      val sign = if (j % 2 == 0) "+" else "-"
      s"$sign (${m(0)(j)}) * ${det3(minor)}"
    }
    terms.mkString("(", " ", ")")
  }

  private def cramer4(mat: Seq[Seq[String]], v: Seq[String], i: Int): String = {
    val mi = mat.zipWithIndex.map { case (row, r) => row.updated(i, v(r)) }
    s"(${det4(mi)}) / (${det4(mat)})"
  }

  /** Symmetric 4x4 from the 10 upper-triangle names m11..m44. */
  private val M4: Seq[Seq[String]] = Seq(
    Seq("m11", "m12", "m13", "m14"), Seq("m12", "m22", "m23", "m24"),
    Seq("m13", "m23", "m33", "m34"), Seq("m14", "m24", "m34", "m44"))
  private val V4 = Seq("v1", "v2", "v3", "v4")

  private def sumCols(sums: Seq[(String, String)]): String =
    sums.map { case (k, e) => s"$e AS $k" }.mkString(",\n        ")

  private def coefCols: String =
    (0 until 4).map(i => s"(${cramer4(M4, V4, i)}) AS c$i").mkString(",\n      ")

  val all: Map[String, Q] = Map(
    // LZ76 is a sequential data-dependent scan — replicated phrase-for-
    // phrase in a recursive CTE over the thresholded bit string (state =
    // scan position + phrase dictionary); counts are integers, exact
    "f_lempel_ziv_complexity" -> Q(
      """WITH RECURSIVE xs AS (
           SELECT user_id,
                  string_agg(CASE WHEN value > 100.0 THEN '1' ELSE '0' END, '' ORDER BY ts, event_id) AS s,
                  count(*) AS n
           FROM events GROUP BY user_id),
         st AS (
           SELECT user_id, s, n, 0 AS ind, 1 AS inc, []::VARCHAR[] AS seen FROM xs
           UNION ALL
           SELECT user_id, s, n,
             CASE WHEN list_contains(seen, substr(s, ind+1, inc)) THEN ind ELSE ind + inc END,
             CASE WHEN list_contains(seen, substr(s, ind+1, inc)) THEN inc + 1 ELSE 1 END,
             CASE WHEN list_contains(seen, substr(s, ind+1, inc)) THEN seen
                  ELSE list_append(seen, substr(s, ind+1, inc)) END
           FROM st WHERE ind + inc <= n)
         SELECT user_id, round(len(seen) / CAST(n AS DOUBLE), 6) AS lempel_ziv_complexity
         FROM st WHERE ind + inc > n""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir),
        FeatureAggs.lempelZivComplexity(threshold = 100.0, asRatio = true),
        "lempel_ziv_complexity"))
    },
    "f_cusum" -> {
      // the CUSUM recurrence (warmup-estimate -> standardized
      // accumulate -> fire-and-reset) replicated step-for-step in a
      // recursive CTE with the SAME float fold order; the counts are
      // integers, so the compare is exact. The accumulate matches the
      // kernel's Rust-max/min semantics (cusum.rs:70-71): a NaN sum
      // (z = 0/0 on a zero-sigma warmup) resets to 0.0 instead of
      // propagating -- a later level shift gives z = +-Inf and fires.
      val muC = "(CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END)"
      val sigC = """(CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                       x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                     ELSE sigma END)"""
      val z = s"(v[i] - $muC) / $sigC"
      val spSum = s"spos + $z - 0.0"
      val snSum = s"sneg + $z + 0.0"
      val spNew = s"(CASE WHEN isnan($spSum) THEN 0.0 ELSE greatest($spSum, 0.0) END)"
      val snNew = s"(CASE WHEN isnan($snSum) THEN 0.0 ELSE least($snSum, 0.0) END)"
      val fire = s"($spNew > 5.0 OR $snNew < -5.0)"
      Q(
        s"""WITH RECURSIVE xs AS (
             SELECT user_id, list(value ORDER BY ts, event_id) AS v, len(list(value)) AS n
             FROM events GROUP BY user_id),
           st AS (
             SELECT user_id, v, n, 1 AS i, 0 AS t,
                    CAST(0.0 AS DOUBLE) AS mu, CAST(0.0 AS DOUBLE) AS sigma,
                    CAST(0.0 AS DOUBLE) AS spos, CAST(0.0 AS DOUBLE) AS sneg,
                    []::DOUBLE[] AS obs, 0 AS cnt
             FROM xs
             UNION ALL
             SELECT user_id, v, n, i + 1,
               CASE WHEN t < 20 THEN t + 1
                    WHEN $fire THEN 0
                    WHEN t = 20 THEN t + 1
                    ELSE t END,
               CASE WHEN t < 20 THEN mu
                    WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END,
               CASE WHEN t < 20 THEN sigma
                    WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                       x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                    ELSE sigma END,
               CASE WHEN t < 20 THEN spos
                    WHEN $fire THEN 0.0
                    ELSE $spNew END,
               CASE WHEN t < 20 THEN sneg
                    WHEN $fire THEN 0.0
                    ELSE $snNew END,
               CASE WHEN t < 20 THEN list_append(obs, v[i])
                    WHEN $fire THEN []::DOUBLE[]
                    ELSE obs END,
               cnt + CASE WHEN t >= 20 AND $fire THEN 1 ELSE 0 END
             FROM st WHERE i <= n)
           SELECT user_id, CAST(cnt AS DOUBLE) AS n_changepoints
           FROM st WHERE i = n + 1""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir),
          FeatureAggs.cusumCount(threshold = 5.0, warmup = 20, drift = 0.0), "n_changepoints"))
      }
    },
    // ApEn/SampEn ARE oracle-expressible: the Chebyshev-ball counts are
    // integers, and the std/mean/log-sum folds are written in the SAME
    // sequential order as the kernel (DuckDB list ops fold in list
    // order), so the doubles match bitwise (prototype-verified)
    "f_approximate_entropy" -> FuzzBuilders.approximateEntropy(m = 2, ratio = 0.5),

    "f_sample_entropy" -> FuzzBuilders.sampleEntropy(m = 2, ratio = 0.2),

    // ADF(2) = OLS of Δy on [level, Δlag1, Δlag2, 1] + t-stat — the 4x4
    // normal system expands via Cramer (see det4/cramer4 above); sums
    // fold in the kernel's time order
    "f_augmented_dickey_fuller" -> {
      val S = (e: String) => s"list_sum(list_transform(range(1, n-2), t -> $e))"
      val (lvl, d1, d2, yy) = ("v[t+2]", "(v[t+2]-v[t+1])", "(v[t+1]-v[t])", "(v[t+3]-v[t+2])")
      val sums = Seq(
        "m11" -> S(s"$lvl*$lvl"), "m12" -> S(s"$lvl*$d1"), "m13" -> S(s"$lvl*$d2"),
        "m14" -> S(lvl), "m22" -> S(s"$d1*$d1"), "m23" -> S(s"$d1*$d2"), "m24" -> S(d1),
        "m33" -> S(s"$d2*$d2"), "m34" -> S(d2), "m44" -> "CAST(n-3 AS DOUBLE)",
        "v1" -> S(s"$lvl*$yy"), "v2" -> S(s"$d1*$yy"), "v3" -> S(s"$d2*$yy"), "v4" -> S(yy))
      Q(
        s"""WITH $XS,
           s AS (SELECT user_id, n, v, ${sumCols(sums)} FROM xs),
           c AS (SELECT user_id, n, v, $coefCols FROM s),
           r AS (SELECT user_id, n, v, c0,
                   ${S(s"pow($yy - (c0*$lvl + c1*$d1 + c2*$d2 + c3), 2)")} AS rss,
                   ${S(lvl)} / (n-3) AS lvlmean
                 FROM c),
           f AS (SELECT user_id, n, c0, rss,
                   list_transform([lvlmean], lm -> ${S(s"($lvl - lm) * ($lvl - lm)")})[1] AS ss
                 FROM r)
           SELECT user_id,
             CASE WHEN n-3 <= 5 THEN 'nan'::DOUBLE
                  ELSE round(c0 / sqrt((rss / (n-3-4)) / ss), 6) END AS adf_stat
           FROM f""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir), FeatureAggs.augmentedDickeyFuller(nLags = 2), "adf_stat"))
      }
    },
    // single-segment Welch PSD (n < 256 → scipy.welch degenerates to one
    // hann-windowed detrended periodogram) binned-entropy'd — direct
    // O(n·m) DFT in list ops; rd6 absorbs FFT-vs-DFT ULP differences
    "f_fourier_entropy" -> Q(
      s"""WITH $XS,
         w AS (SELECT user_id, n,
                 list_transform(range(1, n+1), j -> (v[j] - list_sum(v)/n) * (0.5 - 0.5*cos(2*pi()*(j-1)/n))) AS d,
                 list_sum(list_transform(range(1, n+1), j ->
                   (0.5 - 0.5*cos(2*pi()*(j-1)/n)) * (0.5 - 0.5*cos(2*pi()*(j-1)/n)))) AS winss
               FROM xs),
         p AS (SELECT user_id,
                 list_transform(range(0, n//2 + 1), f ->
                   CASE WHEN f = 0 OR (n % 2 = 0 AND f = n//2)
                          THEN pow(list_sum(list_transform(range(1, n+1), j -> d[j] * cos(2*pi()*f*(j-1)/n))), 2) / winss
                        ELSE (pow(list_sum(list_transform(range(1, n+1), j -> d[j] * cos(2*pi()*f*(j-1)/n))), 2)
                            + pow(list_sum(list_transform(range(1, n+1), j -> d[j] * sin(2*pi()*f*(j-1)/n))), 2)) / winss * 2
                   END) AS pxx
               FROM w)
         SELECT user_id, round(
           list_transform([list_transform(pxx, x -> x / list_max(pxx))], vals ->
             list_transform([list_min(vals)], mn ->
               list_transform([1e-12 + (list_max(vals) - mn) / 10], wd ->
                 -list_sum(list_transform(range(0, 11), b ->
                   list_transform([len(list_filter(vals, x -> CAST(floor((x - mn) / wd) AS BIGINT) = b))], c ->
                     CASE WHEN c > 0 THEN (c / CAST(len(vals) AS DOUBLE)) * ln(c / CAST(len(vals) AS DOUBLE))
                          ELSE CAST(0.0 AS DOUBLE) END)[1]))
               )[1])[1])[1], 6) AS fourier_entropy
         FROM p""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.fourierEntropy(bins = 10), "fourier_entropy"))
    },
    // array-valued outputs are flattened to (entity, idx, value) rows:
    // the driver canonicalizes every dumped frame with a pandas sort,
    // which cannot hash ndarray cells (round-1 compare errors)
    "f_ar_coefficients" -> {
      val S = (e: String) => s"list_sum(list_transform(range(1, n-2), t -> $e))"
      val (x1, x2, x3, y) = ("v[t+2]", "v[t+1]", "v[t]", "v[t+3]")
      val sums = Seq(
        "m11" -> S(s"$x1*$x1"), "m12" -> S(s"$x1*$x2"), "m13" -> S(s"$x1*$x3"), "m14" -> S(x1),
        "m22" -> S(s"$x2*$x2"), "m23" -> S(s"$x2*$x3"), "m24" -> S(x2),
        "m33" -> S(s"$x3*$x3"), "m34" -> S(x3), "m44" -> "CAST(n-3 AS DOUBLE)",
        "v1" -> S(s"$x1*$y"), "v2" -> S(s"$x2*$y"), "v3" -> S(s"$x3*$y"), "v4" -> S(y))
      Q(
        s"""WITH $XS,
           s AS (SELECT user_id, n, ${sumCols(sums)} FROM xs),
           c AS (SELECT user_id, n, $coefCols FROM s),
           u AS (SELECT unnest([0,1,2,3]) AS coef_idx)
           SELECT user_id, CAST(coef_idx AS INT) AS coef_idx,
             CASE WHEN n-3 <= 4 THEN 'nan'::DOUBLE
                  ELSE round(CASE coef_idx WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END, 6)
             END AS coef
           FROM c CROSS JOIN u""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir), FeatureAggs.autoregressiveCoefficients(3), "__a")
          .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
      }
    },
    "f_spkt_welch_density" -> Q(
      s"""WITH $XS,
         w AS (SELECT user_id, n,
                 list_transform(range(1, n+1), j -> (v[j] - list_sum(v)/n) * (0.5 - 0.5*cos(2*pi()*(j-1)/n))) AS d,
                 list_sum(list_transform(range(1, n+1), j ->
                   (0.5 - 0.5*cos(2*pi()*(j-1)/n)) * (0.5 - 0.5*cos(2*pi()*(j-1)/n)))) AS winss
               FROM xs),
         f AS (SELECT unnest([0,1,2,3,4]) AS ff),
         c AS (SELECT user_id, n, winss, ff,
                 list_sum(list_transform(range(1, n+1), j -> d[j] * cos(2*pi()*ff*(j-1)/n))) AS re,
                 list_sum(list_transform(range(1, n+1), j -> d[j] * sin(2*pi()*ff*(j-1)/n))) AS im
               FROM w CROSS JOIN f)
         SELECT user_id, CAST(ff AS INT) AS freq_idx,
           round(CASE WHEN ff = 0 THEN (re*re) / winss
                 ELSE (re*re + im*im) / winss * 2 END, 6) AS density
         FROM c""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.spktWelchDensity(5), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("freq_idx", "density"))))
    },
    // rFFT oracle = direct DFT (Σ x·cos, −Σ x·sin); kernel angle
    // convention atan2(re, im)·180/π replicated verbatim
    "f_fft_coefficients" -> Q(
      s"""WITH $XS,
         k AS (SELECT unnest([0,1,2,3]) AS kk),
         c AS (SELECT user_id, kk,
                 list_sum(list_transform(range(1, n+1), j -> v[j] * cos(2*pi()*kk*(j-1)/n))) AS re,
                 CASE WHEN kk = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE -list_sum(list_transform(range(1, n+1), j -> v[j] * sin(2*pi()*kk*(j-1)/n))) END AS im
               FROM xs CROSS JOIN k)
         SELECT user_id, CAST(kk AS INT) AS coef_idx, round(re,6) AS real, round(im,6) AS imag,
                round(degrees(atan2(re, im)),6) AS angle
         FROM c""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.fftStruct(4), "fft")
        .select(col("user_id"),
          posexplode(arrays_zip(col("fft.real"), col("fft.imag"), col("fft.angle")))
            .as(Seq("coef_idx", "__z")))
        .select(col("user_id"), col("coef_idx"), col("__z.real").as("real"),
          col("__z.imag").as("imag"), col("__z.angle").as("angle")))
    },
    // Ricker-wavelet convolution at output positions 0..2: each value is
    // an O(width) windowed sum — expanded directly (kernel accumulates
    // x-index ascending; so does the lambda)
    "f_cwt_coefficients" -> Q(
      """WITH xs AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v,
                            len(list(value)) AS n FROM events GROUP BY user_id),
         wdt AS (SELECT * FROM (VALUES (0, 2), (1, 5), (2, 10), (3, 20)) AS t(wi, w)),
         idx AS (SELECT unnest([0, 1, 2]) AS p),
         g AS (SELECT user_id, n, v, wi, w, p,
                 LEAST(10*w, n) AS m,
                 (LEAST(10*w, n) - 1) // 2 AS st,
                 2.0 / (sqrt(3.0*w) * pow(pi(), 0.25)) AS amp
               FROM xs CROSS JOIN wdt CROSS JOIN idx),
         c AS (SELECT user_id, CAST(p*4 + wi AS INT) AS coef_idx,
                 list_sum(list_transform(range(GREATEST(0, p + st - m + 1), LEAST(n - 1, p + st) + 1), i ->
                   v[i+1] * (amp * (1 - pow((m - 1 - p - st + i) - (m-1)/2.0, 2) / (w*w))
                                 * exp(-pow((m - 1 - p - st + i) - (m-1)/2.0, 2) / (2.0*w*w))))) AS coef
               FROM g)
         SELECT user_id, coef_idx, round(coef, 6) AS coef FROM c""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.cwtCoefficients(Seq(2, 5, 10, 20), 3), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
    },
    // qcut bins (bin = #bounds strictly below, matching binarySearch on
    // the unique interpolated boundaries) → per-bin means → cubic
    // Vandermonde normal system via the same Cramer expansion. The
    // quantile position replicates the kernel's (i/30.0)*(n−1) float
    // order exactly — a*(b/c) vs (a*b)/c can floor differently
    "f_friedrich_coefficients" -> {
      val P = (e: String) => s"list_sum(list_transform(pts, q -> $e))"
      val (s3, s2, s1, y) = ("pow(q[1],3)", "pow(q[1],2)", "q[1]", "q[2]")
      val sums = Seq(
        "m11" -> P(s"$s3*$s3"), "m12" -> P(s"$s3*$s2"), "m13" -> P(s"$s3*$s1"), "m14" -> P(s3),
        "m22" -> P(s"$s2*$s2"), "m23" -> P(s"$s2*$s1"), "m24" -> P(s2),
        "m33" -> P(s"$s1*$s1"), "m34" -> P(s1), "m44" -> "CAST(len(pts) AS DOUBLE)",
        "v1" -> P(s"$s3*$y"), "v2" -> P(s"$s2*$y"), "v3" -> P(s"$s1*$y"), "v4" -> P(y))
      Q(
        s"""WITH xs AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v,
                               list(value ORDER BY value) AS sv,
                               len(list(value)) AS n FROM events GROUP BY user_id),
           b AS (SELECT user_id, v, n,
                   list_transform(range(1, 30), i ->
                     sv[CAST(floor((i / 30.0) * (n-1)) AS BIGINT) + 1]
                     + ((i / 30.0) * (n-1) - floor((i / 30.0) * (n-1)))
                       * (sv[CAST(ceil((i / 30.0) * (n-1)) AS BIGINT) + 1]
                          - sv[CAST(floor((i / 30.0) * (n-1)) AS BIGINT) + 1])) AS bounds
                 FROM xs),
           binned AS (SELECT user_id,
                   list_transform(range(0, 30), bb -> struct_pack(
                     ss := list_sum(list_transform(range(1, n+1), i ->
                             CASE WHEN len(list_filter(bounds, t -> t < v[i])) = bb THEN v[i] ELSE CAST(0.0 AS DOUBLE) END)),
                     sn := list_sum(list_transform(range(1, n+1), i ->
                             CASE WHEN len(list_filter(bounds, t -> t < v[i])) = bb THEN 1 ELSE 0 END)),
                     ds := list_sum(list_transform(range(2, n+1), i ->
                             CASE WHEN len(list_filter(bounds, t -> t < v[i])) = bb THEN v[i]-v[i-1] ELSE CAST(0.0 AS DOUBLE) END)),
                     dn := list_sum(list_transform(range(2, n+1), i ->
                             CASE WHEN len(list_filter(bounds, t -> t < v[i])) = bb THEN 1 ELSE 0 END)))) AS bins
                 FROM b),
           ptscte AS (SELECT user_id,
                   list_transform(list_filter(bins, x -> x.sn > 0 AND x.dn > 0),
                     x -> [x.ss / x.sn, x.ds / x.dn]) AS pts
                 FROM binned),
           s AS (SELECT user_id, pts, ${sumCols(sums)} FROM ptscte),
           c AS (SELECT user_id, $coefCols FROM s),
           u AS (SELECT unnest([0,1,2,3]) AS coef_idx)
           SELECT user_id, CAST(coef_idx AS INT) AS coef_idx,
             round(CASE coef_idx WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END, 6) AS coef
           FROM c CROSS JOIN u""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir), FeatureAggs.friedrichCoefficients(3, 30), "__a")
          .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
      }
    },
    "p_boxcox_lambda" -> {
      // golden-section MLE replicated in a recursive CTE: the interval
      // shrinks by the same factor on both engines, and each negLl
      // evaluation is a sequential list fold matching the kernel — the
      // SQL fragment is generated from one helper to keep the four
      // usages identical
      // lnj(x) replicates Java Math.log on the full domain (DuckDB ln
      // ERRORS on 0 and negatives; Java gives -Inf / NaN), and the
      // branch comparison is made NaN-IEEE (any NaN -> false) since
      // DuckDB orders NaN greatest while Java's < is IEEE
      def lnj(x: String): String =
        s"""CASE WHEN isnan($x) THEN 'nan'::DOUBLE
                 WHEN $x < 0 THEN 'nan'::DOUBLE
                 WHEN $x = 0 THEN '-infinity'::DOUBLE
                 ELSE ln($x) END"""
      def nll(l: String): String = {
        val y = s"""CASE WHEN abs($l) < 1e-12
                      THEN list_transform(v, x -> ${lnj("x")})
                      ELSE list_transform(v, x -> (pow(x, $l) - 1) / ($l)) END"""
        // bind y then mu via single-element-list lambdas (DuckDB has no
        // let): each is evaluated ONCE per negLl call, keeping the
        // evaluation O(n) — the inlined form re-derived y per element
        // and timed out at sf0.1
        val variance = s"""list_transform([$y], yy ->
              list_transform([list_sum(yy)/n], mu ->
                list_sum(list_transform(yy, t -> (t - mu) * (t - mu))) / n)[1])[1]"""
        s"""(-( (($l) - 1) * slog - n / 2.0 * ${lnj(s"($variance)")} ))"""
      }
      val phi = "((sqrt(5.0) - 1) / 2)"
      Q(
        s"""WITH RECURSIVE xs AS (
              SELECT user_id, list(value ORDER BY ts, event_id) AS v,
                     CAST(len(list(value)) AS DOUBLE) AS n,
                     list_sum(list_transform(list(value ORDER BY ts, event_id),
                       x -> CASE WHEN x < 0 THEN 'nan'::DOUBLE
                                 WHEN x = 0 THEN '-infinity'::DOUBLE
                                 ELSE ln(x) END)) AS slog
              FROM events GROUP BY user_id),
            init AS (
              SELECT user_id, v, n, slog,
                     CAST(-5.0 AS DOUBLE) AS lo, CAST(5.0 AS DOUBLE) AS hi,
                     5.0 - $phi * (5.0 - (-5.0)) AS c, -5.0 + $phi * (5.0 - (-5.0)) AS d
              FROM xs),
            st AS (
              SELECT user_id, v, n, slog, lo, hi, c, d,
                     ${nll("c")} AS fc, ${nll("d")} AS fd
              FROM init
              UNION ALL
              SELECT user_id, v, n, slog,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
                       - $phi * ((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
                                 - (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END))
                     ELSE d END,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN c
                     ELSE (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END)
                       + $phi * ((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
                                 - (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END)) END,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN ${nll(
          s"""((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
               - $phi * ((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
                         - (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END)))""")}
                     ELSE fd END,
                CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN fc
                     ELSE ${nll(
          s"""((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END)
               + $phi * ((CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN d ELSE hi END)
                         - (CASE WHEN (NOT isnan(fc) AND NOT isnan(fd) AND fc < fd) THEN lo ELSE c END)))""")} END
              FROM st WHERE hi - lo > 1e-9)
            SELECT user_id, round((lo + hi) / 2, 6) AS boxcox_lambda
            FROM st WHERE hi - lo <= 1e-9""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir), FeatureAggs.boxcoxLambda, "boxcox_lambda"))
      }
    },
    "p_boxcox_pearsonr" -> {
      // boxcox method="pearsonr" (preprocessing.py:577; scipy
      // boxcox_normmax pearsonr under the reference's bounded
      // optimizer on [-2, 2]): golden-section minimizing 1 − r between
      // Filliben order-statistic normal quantiles (Acklam inverse-CDF,
      // replicated op-for-op) and the sorted transformed sample. The
      // quantile side (xv, centered xd, Σxd²) is λ-free — precomputed
      // once; each objective eval is then one list pass like the MLE's
      def lnj(x: String): String =
        s"""CASE WHEN isnan($x) THEN 'nan'::DOUBLE
                 WHEN $x < 0 THEN 'nan'::DOUBLE
                 WHEN $x = 0 THEN '-infinity'::DOUBLE
                 ELSE ln($x) END"""
      // Acklam rational pieces over a pre-bound q (and r = q²); the
      // literals are the Scala kernel's verbatim
      def lowNum(q: String) =
        s"""(((((-7.784894002430293e-03 * $q + -3.223964580411365e-01) * $q +
             -2.400758277161838e+00) * $q + -2.549732539343734e+00) * $q +
             4.374664141464968e+00) * $q + 2.938163982698783e+00)"""
      def lowDen(q: String) =
        s"""((((7.784695709041462e-03 * $q + 3.224671290700398e-01) * $q +
             2.445134137142996e+00) * $q + 3.754408661907416e+00) * $q + 1.0)"""
      def cenNum(r: String) =
        s"""(((((-3.969683028665376e+01 * $r + 2.209460984245205e+02) * $r +
             -2.759285104469687e+02) * $r + 1.383577518672690e+02) * $r +
             -3.066479806614716e+01) * $r + 2.506628277459239e+00)"""
      def cenDen(r: String) =
        s"""(((((-5.447609879822406e+01 * $r + 1.615858368580409e+02) * $r +
             -1.556989798598866e+02) * $r + 6.680131188771972e+01) * $r +
             -1.328068155288572e+01) * $r + 1.0)"""
      val ppf =
        s"""CASE WHEN u < 0.02425 THEN
              list_transform([sqrt(-2.0 * ln(u))], qq -> ${lowNum("qq")} / ${lowDen("qq")})[1]
            WHEN u <= 1.0 - 0.02425 THEN
              list_transform([u - 0.5], qq ->
                list_transform([qq * qq], rr -> ${cenNum("rr")} * qq / ${cenDen("rr")})[1])[1]
            ELSE
              list_transform([sqrt(-2.0 * ln(1.0 - u))], qq -> -(${lowNum("qq")} / ${lowDen("qq")}))[1]
            END"""
      def obj(l: String): String = {
        val y = s"""CASE WHEN abs($l) < 1e-12
                      THEN list_transform(sv, x -> ${lnj("x")})
                      ELSE list_transform(sv, x -> (pow(x, $l) - 1) / ($l)) END"""
        s"""list_transform([$y], yy ->
              list_transform([list_sum(yy) / n], ym ->
                1.0 - list_sum(list_transform(range(1, CAST(n AS BIGINT) + 1),
                        i -> xd[i] * (yy[i] - ym)))
                    / (sqrt(dx) * sqrt(list_sum(list_transform(yy,
                        t -> (t - ym) * (t - ym)))))
              )[1])[1]"""
      }
      val phi = "((sqrt(5.0) - 1) / 2)"
      val cond = "(NOT isnan(fc) AND NOT isnan(fd) AND fc < fd)"
      val nlo = s"CASE WHEN $cond THEN lo ELSE c END"
      val nhi = s"CASE WHEN $cond THEN d ELSE hi END"
      Q(
        s"""WITH RECURSIVE xs AS (
              SELECT user_id, list(value ORDER BY value) AS sv,
                     CAST(len(list(value)) AS DOUBLE) AS n
              FROM events GROUP BY user_id),
            xq AS (
              SELECT user_id, sv, n,
                list_transform(range(1, CAST(n AS BIGINT) + 1), i ->
                  list_transform([CASE WHEN i = CAST(n AS BIGINT) THEN pow(0.5, 1.0 / n)
                                       WHEN i = 1 THEN 1.0 - pow(0.5, 1.0 / n)
                                       ELSE (i - 0.3175) / (n + 0.365) END],
                    u -> $ppf)[1]) AS xv
              FROM xs),
            xc AS (
              SELECT user_id, sv, n,
                list_transform([list_sum(xv) / n], xm ->
                  list_transform(xv, t -> t - xm))[1] AS xd
              FROM xq),
            xdm AS (
              SELECT user_id, sv, n, xd,
                     list_sum(list_transform(xd, t -> t * t)) AS dx
              FROM xc),
            init AS (
              SELECT user_id, sv, n, xd, dx,
                     CAST(-2.0 AS DOUBLE) AS lo, CAST(2.0 AS DOUBLE) AS hi,
                     2.0 - $phi * (2.0 - (-2.0)) AS c, -2.0 + $phi * (2.0 - (-2.0)) AS d
              FROM xdm),
            st AS (
              SELECT user_id, sv, n, xd, dx, lo, hi, c, d,
                     ${obj("c")} AS fc, ${obj("d")} AS fd
              FROM init
              UNION ALL
              SELECT user_id, sv, n, xd, dx,
                $nlo, $nhi,
                CASE WHEN $cond THEN ($nhi) - $phi * (($nhi) - ($nlo)) ELSE d END,
                CASE WHEN $cond THEN c ELSE ($nlo) + $phi * (($nhi) - ($nlo)) END,
                CASE WHEN $cond THEN ${obj(s"(($nhi) - $phi * (($nhi) - ($nlo)))")} ELSE fd END,
                CASE WHEN $cond THEN fc ELSE ${obj(s"(($nlo) + $phi * (($nhi) - ($nlo)))")} END
              FROM st WHERE hi - lo > 1e-9)
            SELECT user_id, round((lo + hi) / 2, 6) AS boxcox_pearsonr
            FROM st WHERE hi - lo <= 1e-9""") { (s, dir) =>
        r6(FeatureAggs.over(ev(s, dir), FeatureAggs.boxcoxLambdaPearsonr, "boxcox_pearsonr"))
      }
    }
  )
}

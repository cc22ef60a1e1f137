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

  val all: Map[String, Q] = Map(
    "f_lempel_ziv_complexity" -> over("lempel_ziv_complexity",
      FeatureAggs.lempelZivComplexity(threshold = 100.0, asRatio = true)),
    // the CUSUM recurrence (warmup-estimate → standardized accumulate →
    // fire-and-reset) replicated step-for-step in a DuckDB recursive
    // CTE with the SAME float fold order — the counts are integers, so
    // the compare is exact
    "f_cusum" -> Q(
      """WITH RECURSIVE xs AS (
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
                  WHEN (greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) > 5.0
                     OR least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) < -5.0)
                  THEN 0
                  WHEN t = 20 THEN t + 1
                  ELSE t END,
             CASE WHEN t < 20 THEN mu
                  WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END,
             CASE WHEN t < 20 THEN sigma
                  WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                     x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                  ELSE sigma END,
             CASE WHEN t < 20 THEN spos
                  WHEN (greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) > 5.0
                     OR least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) < -5.0)
                  THEN 0.0
                  ELSE greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) END,
             CASE WHEN t < 20 THEN sneg
                  WHEN (greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) > 5.0
                     OR least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) < -5.0)
                  THEN 0.0
                  ELSE least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) END,
             CASE WHEN t < 20 THEN list_append(obs, v[i])
                  WHEN (greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) > 5.0
                     OR least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) < -5.0)
                  THEN []::DOUBLE[]
                  ELSE obs END,
             cnt + CASE WHEN t >= 20 AND
                  (greatest(spos + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) - 0.0, 0.0) > 5.0
                     OR least(sneg + (v[i] - (CASE WHEN t = 20 THEN list_sum(obs)/len(obs) ELSE mu END))
                          / (CASE WHEN t = 20 THEN sqrt(list_sum(list_transform(obs,
                               x -> (x - list_sum(obs)/len(obs)) * (x - list_sum(obs)/len(obs))))/len(obs))
                             ELSE sigma END) + 0.0, 0.0) < -5.0)
                  THEN 1 ELSE 0 END
           FROM st WHERE i <= n)
         SELECT user_id, CAST(cnt AS DOUBLE) AS n_changepoints
         FROM st WHERE i = n + 1""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir),
        FeatureAggs.cusumCount(threshold = 5.0, warmup = 20, drift = 0.0), "n_changepoints"))
    },
    // ApEn/SampEn ARE oracle-expressible: the Chebyshev-ball counts are
    // integers, and the std/mean/log-sum folds are written in the SAME
    // sequential order as the kernel (DuckDB list ops fold in list
    // order), so the doubles match bitwise (prototype-verified)
    "f_approximate_entropy" -> Q(
      """WITH xs AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v
                     FROM events GROUP BY user_id),
              st AS (SELECT user_id, v, len(v) AS n,
                       0.5 * sqrt(list_sum(list_transform(v,
                         x -> (x - list_sum(v)/len(v)) * (x - list_sum(v)/len(v)))) / (len(v)-1)) AS r
                     FROM xs)
         SELECT user_id, round(abs(
           list_sum(list_transform(range(1, n), i ->
             ln(len(list_filter(range(1, n), j ->
               greatest(abs(v[i]-v[j]), abs(v[i+1]-v[j+1])) <= r))::DOUBLE / (n-1))))
             / (n-1)
           -
           list_sum(list_transform(range(1, n-1), i ->
             ln(len(list_filter(range(1, n-1), j ->
               greatest(abs(v[i]-v[j]), abs(v[i+1]-v[j+1]), abs(v[i+2]-v[j+2])) <= r))::DOUBLE / (n-2))))
             / (n-2)
         ), 6) AS approximate_entropy
         FROM st""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir),
        FeatureAggs.approximateEntropy(m = 2, r = 0.5), "approximate_entropy"))
    },
    "f_sample_entropy" -> Q(
      """WITH xs AS (SELECT user_id, list(value ORDER BY ts, event_id) AS v
                     FROM events GROUP BY user_id),
              st AS (SELECT user_id, v, len(v) AS n,
                       0.2 * sqrt(list_sum(list_transform(v,
                         x -> (x - list_sum(v)/len(v)) * (x - list_sum(v)/len(v)))) / len(v)) AS r
                     FROM xs),
              cnt AS (SELECT user_id,
                (list_sum(list_transform(range(1, n), i ->
                   len(list_filter(range(1, n), j ->
                     greatest(abs(v[i]-v[j]), abs(v[i+1]-v[j+1])) <= r)))) - (n-1)) AS b,
                (list_sum(list_transform(range(1, n-1), i ->
                   len(list_filter(range(1, n-1), j ->
                     greatest(abs(v[i]-v[j]), abs(v[i+1]-v[j+1]), abs(v[i+2]-v[j+2])) <= r)))) - (n-2)) AS a
                FROM st)
         SELECT user_id,
           CASE WHEN a = 0 AND b > 0 THEN 'inf'::DOUBLE
                WHEN a = 0 AND b = 0 THEN 'nan'::DOUBLE
                ELSE round(ln(b::DOUBLE / a::DOUBLE), 6) END AS sample_entropy
         FROM cnt""") { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir),
        FeatureAggs.sampleEntropy(ratio = 0.2, m = 2), "sample_entropy"))
    },
    "f_augmented_dickey_fuller" -> over("adf_stat",
      FeatureAggs.augmentedDickeyFuller(nLags = 2)),
    "f_fourier_entropy" -> over("fourier_entropy",
      FeatureAggs.fourierEntropy(bins = 10)),
    // array-valued outputs are flattened to (entity, idx, value) rows:
    // the driver canonicalizes every dumped frame with a pandas sort,
    // which cannot hash ndarray cells (round-1 compare errors)
    "f_ar_coefficients" -> Q.rowsOnly { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.autoregressiveCoefficients(3), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
    },
    "f_spkt_welch_density" -> Q.rowsOnly { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.spktWelchDensity(5), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("freq_idx", "density"))))
    },
    "f_fft_coefficients" -> Q.rowsOnly { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.fftStruct(4), "fft")
        .select(col("user_id"),
          posexplode(arrays_zip(col("fft.real"), col("fft.imag"), col("fft.angle")))
            .as(Seq("coef_idx", "__z")))
        .select(col("user_id"), col("coef_idx"), col("__z.real").as("real"),
          col("__z.imag").as("imag"), col("__z.angle").as("angle")))
    },
    "f_cwt_coefficients" -> Q.rowsOnly { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.cwtCoefficients(Seq(2, 5, 10, 20), 3), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
    },
    "f_friedrich_coefficients" -> Q.rowsOnly { (s, dir) =>
      r6(FeatureAggs.over(ev(s, dir), FeatureAggs.friedrichCoefficients(3, 30), "__a")
        .select(col("user_id"), posexplode(col("__a")).as(Seq("coef_idx", "coef"))))
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
    }
  )
}

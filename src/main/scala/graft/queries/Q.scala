package graft.queries

import graft.core.Panel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One registered operator query: the Spark program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names must match exactly between the two (the driver's
  * compare sorts columns by name before hashing). */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables(s, dir, name)

  /** events as panel: entity=user_id, time=(ts, event_id), x=value. */
  def ev(s: SparkSession, dir: String): Panel = Panel.events(s, dir)

  /** DuckDB-compatible 6-dp rounding: round-half-away-from-zero on the
    * RAW double (std::round(x·10⁶)/10⁶), not Spark's decimal-string
    * round() — the two disagree on values whose shortest decimal repr
    * is a tie but whose double sits off it. Applied to all float
    * columns so both engines hash identical values. */
  def rd6(c: Column): Column = {
    // signum·floor(|y|+0.5) IS std::round, including the sign of zero:
    // DuckDB round(-1e-16, 6) = -0.0, and the driver hash is bitwise —
    // Spark floor/ceil return LONG and would collapse -0.0 to 0.0
    // (round-1 p_fourier_terms hash mismatch). NaN/±Inf pass through
    // unchanged (Spark floor(NaN|Inf) collapses to Long.MaxValue);
    // |y| ≥ 2^52 passes through too — 6-dp rounding is ULP-ambiguous
    // there and such magnitudes must use the decimal-string path.
    val cd = c.cast("double")
    val y = cd * 1e6
    when(isnan(cd) || abs(y) >= 4.503599627370496e15, cd)
      .otherwise(signum(y) * floor(abs(y) + 0.5) / 1e6)
  }

  /** 4-dp variant for fixtures whose distributed aggregation order
    * makes the 6th decimal a ULP tie at larger scale factors. */
  def rd4(c: Column): Column = {
    val cd = c.cast("double")
    val y = cd * 1e4
    when(isnan(cd) || abs(y) >= 4.503599627370496e15, cd)
      .otherwise(signum(y) * floor(abs(y) + 0.5) / 1e4)
  }

  def r6(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType => rd6(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Shared DuckDB window-spec fragments (events panel). */
  val W = "PARTITION BY user_id ORDER BY ts, event_id"
  val WE = "PARTITION BY user_id"

  /** Unrolled Cholesky solve of a d-dim SPD system as a chain of
    * MATERIALIZED CTE stages (DuckDB substitutes lateral aliases
    * textually, so a single-SELECT unroll blows up exponentially in d
    * — the 8-dim variant hung the oracle). Input CTE `from0` must have
    * columns `m_<i>_<j>` (upper triangle, i ≤ j) and `b_<i>`; the
    * returned fragment defines CTEs `<p>0.. <p>N`, the last of which
    * carries the solution `a_0..a_{d-1}`. Append it inside WITH and
    * select from [[cholSolveLast]]. Mirrors
    * [[graft.functions.Ols.choleskySolve]]'s arithmetic so the engines
    * agree to well under the rd6 rounding grain. */
  def cholSolveSql(d: Int, from0: String, p: String = "ch"): String = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    for (j <- 0 until d) {
      val diag = (s"m_${j}_$j" +: (0 until j).map(k => s"- l_${j}_$k * l_${j}_$k")).mkString(" ")
      val cols = s"sqrt($diag) AS l_${j}_$j" +: (j + 1 until d).map { i =>
        val num = (s"m_${j}_$i" +: (0 until j).map(k => s"- l_${i}_$k * l_${j}_$k")).mkString(" ")
        s"($num) / sqrt($diag) AS l_${i}_$j"
      }
      stages += cols.mkString(", ")
    }
    for (i <- 0 until d) {
      val num = (s"b_$i" +: (0 until i).map(k => s"- l_${i}_$k * y_$k")).mkString(" ")
      stages += s"($num) / l_${i}_$i AS y_$i"
    }
    for (i <- d - 1 to 0 by -1) {
      val num = (s"y_$i" +: (i + 1 until d).map(k => s"- l_${k}_$i * a_$k")).mkString(" ")
      stages += s"($num) / l_${i}_$i AS a_$i"
    }
    stages.zipWithIndex.map { case (cols, n) =>
      val src = if (n == 0) from0 else s"$p${n - 1}"
      s"$p$n AS MATERIALIZED (SELECT *, $cols FROM $src)"
    }.mkString(", ")
  }

  /** Name of the final CTE emitted by [[cholSolveSql]]. */
  def cholSolveLast(d: Int, p: String = "ch"): String = s"$p${3 * d - 1}"

  /** Unrolled cyclic-coordinate-descent elastic-net solve (the sklearn
    * `ElasticNet`/`Lasso` objective) as MATERIALIZED CTE stages — the
    * oracle side of [[graft.functions.Ols.cdFromMoments]], replicating
    * its arithmetic term-for-term: moment centering, the k-ascending ρ
    * accumulation, the soft-threshold branches, and the intercept
    * recovery, all at a FIXED sweep count so both engines run the
    * identical update sequence. One CTE per coordinate update (a
    * single-SELECT unroll would re-expand each lateral ρ alias 4× per
    * CASE branch — exponential text blowup, same hazard cholSolveSql
    * documents). Input CTE `from0` must carry `m_<i>_<j>` (upper
    * triangle incl. intercept row 0) and `b_<i>`; the final CTE
    * ([[cdSolveLast]]) carries the solution `a_0..a_<p>`. */
  def cdSolveSql(p: Int, alpha: Double, l1Ratio: Double, sweeps: Int,
                 from0: String, pre: String = "cd"): String = {
    def cName(j: Int, k: Int) = s"c_${math.min(j, k)}_${math.max(j, k)}"
    val ctr = {
      val cs = for (j <- 1 to p; k <- j to p)
        yield s"m_${j}_$k - m_0_$j * m_0_$k / m_0_0 AS c_${j}_$k"
      val ccs = (1 to p).map(j => s"b_$j - m_0_$j * b_0 / m_0_0 AS cc_$j")
      val consts = Seq(
        s"m_0_0 * ${alpha * l1Ratio} AS ${pre}_thr",
        s"m_0_0 * ${alpha * (1.0 - l1Ratio)} AS ${pre}_l2")
      val w0 = (1 to p).map(j => s"CAST(0.0 AS DOUBLE) AS w0_$j")
      (cs ++ ccs ++ consts ++ w0).mkString(", ")
    }
    val stages = scala.collection.mutable.ArrayBuffer[String](ctr)
    for (t <- 1 to sweeps; j <- 1 to p) {
      val wref = (k: Int) => if (k < j) s"w${t}_$k" else s"w${t - 1}_$k"
      val rho = (s"cc_$j" +: (1 to p).filter(_ != j).toSeq
        .map(k => s"- ${cName(j, k)} * ${wref(k)}")).mkString(" ")
      val r = s"r${t}_$j"
      val den = s"(c_${j}_$j + ${pre}_l2)"
      stages += s"""($rho) AS $r,
          CASE WHEN $den <= 0.0 THEN CAST(0.0 AS DOUBLE)
               WHEN $r > ${pre}_thr THEN ($r - ${pre}_thr) / $den
               WHEN $r < -${pre}_thr THEN ($r + ${pre}_thr) / $den
               ELSE CAST(0.0 AS DOUBLE) END AS w${t}_$j"""
    }
    val dot = (s"0.0" +: (1 to p).map(j => s"+ w${sweeps}_$j * m_0_$j")).mkString(" ")
    stages += (s"(b_0 - ($dot)) / m_0_0 AS a_0" +:
      (1 to p).map(j => s"w${sweeps}_$j AS a_$j")).mkString(", ")
    stages.zipWithIndex.map { case (cols, n) =>
      val src = if (n == 0) from0 else s"$pre${n - 1}"
      s"$pre$n AS MATERIALIZED (SELECT *, $cols FROM $src)"
    }.mkString(", ")
  }

  /** Name of the final CTE emitted by [[cdSolveSql]]. */
  def cdSolveLast(p: Int, sweeps: Int, pre: String = "cd"): String =
    s"$pre${1 + sweeps * p}"

  /** NO-INTERCEPT cyclic-CD elastic-net solve
    * ([[graft.functions.Ols.elasticNetCDNoDrift]]'s oracle): CD on the
    * RAW Gram system — no centering, no intercept recovery. Input CTE
    * `from0` must carry `m_<i>_<j>` (0-based FEATURE indices, upper
    * triangle), `b_<i>`, and `nn` (row count). The final CTE
    * ([[cdSolveNoDriftLast]]) carries `a_0..a_{p-1}` aligned with the
    * drift=false predStages naming. */
  def cdSolveNoDriftSql(p: Int, alpha: Double, l1Ratio: Double, sweeps: Int,
                        from0: String, pre: String = "cnd"): String = {
    def mName(j: Int, k: Int) = s"m_${math.min(j, k)}_${math.max(j, k)}"
    val ctr = {
      val consts = Seq(
        s"nn * ${alpha * l1Ratio} AS ${pre}_thr",
        s"nn * ${alpha * (1.0 - l1Ratio)} AS ${pre}_l2")
      val w0 = (0 until p).map(j => s"CAST(0.0 AS DOUBLE) AS w0_$j")
      (consts ++ w0).mkString(", ")
    }
    val stages = scala.collection.mutable.ArrayBuffer[String](ctr)
    for (t <- 1 to sweeps; j <- 0 until p) {
      val wref = (k: Int) => if (k < j) s"w${t}_$k" else s"w${t - 1}_$k"
      val rho = (s"b_$j" +: (0 until p).filter(_ != j).toSeq
        .map(k => s"- ${mName(j, k)} * ${wref(k)}")).mkString(" ")
      val r = s"r${t}_$j"
      val den = s"(${mName(j, j)} + ${pre}_l2)"
      stages += s"""($rho) AS $r,
          CASE WHEN $den <= 0.0 THEN CAST(0.0 AS DOUBLE)
               WHEN $r > ${pre}_thr THEN ($r - ${pre}_thr) / $den
               WHEN $r < -${pre}_thr THEN ($r + ${pre}_thr) / $den
               ELSE CAST(0.0 AS DOUBLE) END AS w${t}_$j"""
    }
    stages += (0 until p).map(j => s"w${sweeps}_$j AS a_$j").mkString(", ")
    stages.zipWithIndex.map { case (cols, n) =>
      val src = if (n == 0) from0 else s"$pre${n - 1}"
      s"$pre$n AS MATERIALIZED (SELECT *, $cols FROM $src)"
    }.mkString(", ")
  }

  /** Name of the final CTE emitted by [[cdSolveNoDriftSql]]. */
  def cdSolveNoDriftLast(p: Int, sweeps: Int, pre: String = "cnd"): String =
    s"$pre${1 + sweeps * p}"

  /** DuckDB fragment: 12 hex nibbles of hex-string expression `h`
    * starting at 1-based position `off+1`, as a BIGINT — the oracle
    * side of the portable 48-bit md5-half hashes
    * (Spark: conv(substring(md5(x),off+1,12),16,10)). */
  def hex12ToLongSql(h: String, off: Int = 0): String = (0 until 12)
    .map(i => s"(strpos('0123456789abcdef', substring($h, ${off + i + 1}, 1)) - 1) * ${1L << (4 * (11 - i))}")
    .mkString("(", " + ", ")")

  /** Normal-equation moment aggregates for regressors `xs` (index 0 is
    * the literal intercept "1.0") against label `y`: `m_<i>_<j>` =
    * Σ xᵢxⱼ (upper triangle) and `b_<i>` = Σ xᵢ·y. `ridge` > 0 adds λ
    * to the non-intercept diagonal (sklearn-Ridge semantics, matching
    * Ols.fit). */
  def olsMomentsSql(xs: Seq[String], y: String, ridge: Double = 0.0,
                    penalizeFrom: Int = 1): String = {
    val d = xs.length
    val ms = for (i <- 0 until d; j <- i until d) yield {
      val pen = if (ridge != 0.0 && i == j && i >= penalizeFrom) s" + $ridge" else ""
      s"sum(${xs(i)} * ${xs(j)})$pen AS m_${i}_$j"
    }
    val bs = (0 until d).map(i => s"sum(${xs(i)} * $y) AS b_$i")
    (ms ++ bs).mkString(", ")
  }
}

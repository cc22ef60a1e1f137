package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Data-mixture resampling — downweighting over-represented sources to
  * target proportions — is a core step in assembling an LLM training
  * corpus. The draw must be REPRODUCIBLE (same corpus → same sample on
  * any engine, any partitioning, any rerun) and join-stable, which
  * `rand()` is not: the decision here is a pure hash of the row key,
  * so it's a stateless, shuffle-free filter that composes with scans
  * at 100 TB and replays bit-identically in the DuckDB oracle.
  */
object Sampling {

  /** Uniform [0,1) from the first 48 bits of md5(key): portable across
    * engines (the same md5-hex-to-long scheme as Dedup's oracle hash
    * family), exact in doubles (48 < 53 mantissa bits). The key is
    * canonicalized through its string form so numeric keys hash their
    * decimal rendering on every engine (bigint → binary casts are
    * engine-specific or rejected outright). */
  def uniformHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("double") / lit(281474976710656.0) // 2^48

  /** Keep each row iff uniformHash(key) < weight — with `weight` a
    * per-row column (typically a stratum-dependent target rate). */
  def mixtureSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(uniformHash(key) < weight)

  /** Temperature-balanced source mixing — the Pile/LLaMA-style
    * upweighting of small sources: draw probability of source s ∝
    * p_s^α with p_s its token share, here α = 1/2 so the reweighting
    * is `sqrt` — which IEEE 754 requires correctly rounded, making the
    * rates BIT-identical across engines where a libm `pow` is not.
    * Expected kept tokens ≈ `tokenBudget`; per-source keep rate =
    * min(1, B·q_s/t_s) with q_s = √t_s / Σ√t (the Σ folds left in
    * source-name order on both engines; the rate is 6-dp-rounded so
    * the 48-bit dyadic hash draw can never flip on a last-ulp
    * difference). One tiny per-source aggregate (driver-side rates,
    * source cardinality is small), then the same stateless portable
    * hash filter as [[mixtureSample]] — zero extra shuffle at any
    * corpus size. Returns kept docs with their source rate. */
  def temperatureMixture(docs: DataFrame, idCol: String, srcCol: String,
                         textCol: String, tokenBudget: Long): DataFrame = {
    val rates = sourceRates(docs, srcCol, textCol, tokenBudget)
    val rate = rates.foldLeft(lit(Double.NaN)) { case (acc, (s, r)) =>
      when(col(srcCol) === s, lit(r)).otherwise(acc)
    }
    val keyed = docs.withColumn("rate", graft.queries.Q.rd6(rate))
    mixtureSample(keyed,
      concat(col(srcCol), lit(":"), col(idCol).cast("string")), col("rate"))
  }

  /** Per-source α=1/2 temperature keep rates from one tiny aggregate:
    * (source, min(1, B·√t_s/Σ√t/t_s)) in source-name order. Fails fast
    * (not NPE) on NULL source values and on sources whose token sum is
    * NULL (every text NULL) — both would otherwise mis-mix silently. */
  def sourceRates(corpus: DataFrame, srcCol: String, textCol: String,
                  tokenBudget: Long): Seq[(String, Double)] = {
    val rows = corpus.groupBy(col(srcCol))
      .agg(sum(graft.operators.TextAnalysis.tokenCount(col(textCol)).cast("long")).as("t"))
      .collect()
    rows.foreach { r =>
      require(!r.isNullAt(0),
        s"temperature mixture: NULL value in source column '$srcCol' — " +
          "drop or impute before mixing")
      require(!r.isNullAt(1),
        s"temperature mixture: source '${r.getString(0)}' has only NULL " +
          s"'$textCol' values (token sum is NULL)")
      // 0 tokens would make the rate 0/0 = NaN and the hash-draw filter
      // would silently drop the whole source — fail fast instead
      require(r.getLong(1) > 0L,
        s"temperature mixture: source '${r.getString(0)}' has zero tokens " +
          s"in '$textCol' — its sqrt-weighted rate is undefined")
    }
    val per = rows.map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val denom = per.foldLeft(0.0) { case (acc, (_, t)) => acc + math.sqrt(t.toDouble) }
    per.map { case (s, t) =>
      s -> math.min(1.0, tokenBudget * (math.sqrt(t.toDouble) / denom) / t.toDouble)
    }
  }

  /** EXACT-size per-stratum sample: the k rows of each stratum with
    * the smallest md5(key) — a deterministic "random" rank, so the
    * sample is reproducible and join-stable like [[mixtureSample]]
    * but with a guaranteed count (mixture sampling only hits the
    * target rate in expectation). One shuffle on the stratum key;
    * the per-stratum sort spills, so a giant stratum cannot OOM an
    * executor. Adds `__rank` (1-based within stratum). */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], key: Column,
                       k: Int, rankCol: String = "__rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(key.cast("string").cast("binary")), key)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}

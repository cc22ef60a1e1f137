package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logistic regression by IRLS / Newton on per-iteration moment
  * aggregations — the classifier side of the censored forecaster
  * family (reference: functime/forecasting/censored.py:32-96, whose
  * classifier is a driver-side sklearn fit over the collected
  * reduction).
  *
  * Spark-native shape: iteration t computes the weighted normal
  * moments X^T W X (upper triangle) and the gradient X^T (y − μ) in
  * ONE codegen'd aggregation pass over the distributed reduction —
  * the same partial-final `sum()` machinery as [[Ols]] — then takes
  * the Newton step on the driver (a (p+1)-dim Cholesky). `iters`
  * passes total, each O(p²) aggregate state per partition: at 100 TB
  * this is `iters` scans with map-side combine, never a collected
  * matrix, and typically fewer passes than LBFGS needs for the same
  * tolerance.
  *
  * A FIXED iteration count (no tolerance exit) keeps the update
  * sequence deterministic, so the DuckDB oracle
  * (queries/OlsBacktestSql.logisticIrlsSql) replicates it
  * step-exactly. Newton converges quadratically: 6 iterations reach
  * the MLE to ~machine precision on non-separable data.
  */
object Logistic {

  /** Fit P(label=1) = σ(b₀ + w·x). `lambda` > 0 adds an L2 penalty
    * λ/2·‖w‖² (intercept unpenalized). Rows with any null dropped.
    * Returns (intercept, weights). */
  def fitIrls(df: DataFrame, featureCols: Seq[String], labelCol: String,
              lambda: Double = 0.0, iters: Int = 6): (Double, Array[Double]) = {
    val p = featureCols.length
    val d = p + 1
    val cached = df.na.drop(featureCols :+ labelCol).cache()
    // size the iteration loop's parallelism to the data (the GBT-fit
    // rule): `iters` sequential jobs over tiny partitions are pure
    // scheduling overhead, so target ~100k rows/partition (floor 1) —
    // a 100 TB reduction still fans out to thousands of tasks
    val n = cached.count()
    if (n == 0) {
      cached.unpersist() // the try/finally below hasn't been entered yet
      throw new IllegalArgumentException(
        s"logistic fit has no complete training rows (all rows empty or " +
          s"null in ${featureCols.mkString(", ")} / $labelCol)")
    }
    val parts = math.max(1L,
      math.min(cached.rdd.getNumPartitions.toLong, n / 100000L)).toInt
    val rows =
      if (parts < cached.rdd.getNumPartitions) cached.coalesce(parts) else cached
    try {
      val xs: IndexedSeq[Column] =
        lit(1.0) +: featureCols.toIndexedSeq.map(c => col(c).cast("double"))
      val y = col(labelCol).cast("double")
      val beta = new Array[Double](d)
      val spark = df.sparkSession
      var t = 0
      while (t < iters) {
        // β rides in as a broadcast single-row ARRAY column, not as
        // inlined literals: the generated code is then byte-identical
        // across iterations, so whole-stage codegen compiles ONCE for
        // all `iters` passes instead of once per iteration (measured
        // ~2× on the cold fit; the arithmetic is value-identical)
        val betaDf = spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(beta.toSeq)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__beta",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, containsNull = false)))))
        val withB = rows.crossJoin(broadcast(betaDf))
        def bq(j: Int): Column = element_at(col("__beta"), j + 1)
        // per-row: η = β₀ + Σ βⱼxⱼ (left-to-right), μ = σ(η),
        // w = μ(1−μ), r = y − μ — arithmetic order mirrored by the SQL
        // oracle generator; keep the two in lockstep
        val eta = (1 to p).foldLeft(bq(0))((acc, j) => acc + bq(j) * xs(j))
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        val wr = mu * (lit(1.0) - mu)
        val rr = y - mu
        // μ/w/r are PROJECTED once per row, and the tri + d sums read
        // the projected columns (r15): inlining wr into every one of
        // the tri cells made each iteration's analyzed tree ~2.5k
        // nodes — ~0.25 s of driver planning per iteration × 6
        // iterations, over half of fc_censored's wall (JobProfile gap).
        // The optimizer keeps the projection (wr is non-cheap and
        // referenced tri times, so CollapseProject won't inline it);
        // each sum's per-row arithmetic — w·(xᵢ·xⱼ) on the identical μ
        // — is unchanged, so the Newton sequence stays step-exact.
        val prep = withB.select(
          (0 until d).map(i => xs(i).as(s"__x$i")) ++
            Seq(wr.as("__w"), rr.as("__r")): _*)
        def px(i: Int): Column = col(s"__x$i")
        val exprs = (for (i <- 0 until d; j <- i until d)
          yield sum(col("__w") * px(i) * px(j))) ++
          (0 until d).map(i => sum(col("__r") * px(i)))
        val row = prep.agg(exprs.head, exprs.tail: _*).collect()(0)
        val tri = d * (d + 1) / 2
        val h = Array.ofDim[Double](d, d)
        var k = 0
        for (i <- 0 until d; j <- i until d) {
          h(i)(j) = row.getDouble(k); h(j)(i) = row.getDouble(k); k += 1
        }
        val g = Array.tabulate(d)(i => row.getDouble(tri + i))
        if (lambda != 0.0) {
          var j = 1
          while (j < d) { h(j)(j) += lambda; g(j) -= lambda * beta(j); j += 1 }
        }
        val delta = Ols.choleskySolve(h, g)
        var j = 0
        while (j < d) { beta(j) += delta(j); j += 1 }
        t += 1
      }
      (beta(0), beta.drop(1))
    } finally cached.unpersist(blocking = false)
  }
}

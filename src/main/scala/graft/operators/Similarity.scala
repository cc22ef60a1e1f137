package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding
  * columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (query-set × corpus join —
  * correct at any scale when the query set is small and broadcast).
  * Scale path: random-hyperplane LSH buckets (deterministic seeded
  * planes) restricting candidates to same-bucket vectors; the classic
  * recall/cost trade. Dot products use `aggregate`/`zip_with` higher-
  * order functions: codegen-friendly, no UDF.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two array columns, computed in double — a native
    * codegen'd Expression (single fused loop, no intermediate product
    * array; see [[graft.functions.ArrayDotProduct]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.dot(a, b)

  /** Higher-order-function formulation kept for reference/fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors (excluding itself). The query side is
    * broadcast — the corpus never moves. Norms are computed ONCE per
    * vector before the pair join (identical doubles — the same
    * array's norm — but 1 array pass per pair instead of 3). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    // zero-norm vectors (failed/padded embeddings) have no cosine
    // direction: sim = 0/0 = NaN, and Spark sorts NaN ABOVE all
    // doubles in a descending order-by — one all-zeros corpus row
    // would silently rank as the #1 neighbor of every query. Exclude
    // both sides explicitly.
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv"))).filter(col("__qn") > 0))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv"))).filter(col("__cn") > 0)
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim")
  }

  /** Deterministic random-hyperplane LSH: `planes` seeded unit
    * directions; bucket = sign bits packed into a long. Planes are
    * generated driver-side from the seed and inlined as literals —
    * identical across executors, no shuffle of the plane matrix. */
  def randomHyperplaneBuckets(emb: DataFrame, vecCol: String, planes: Int,
                              seed: Long): DataFrame = {
    // shiftleft masks the shift mod 64: plane i ≥ 64 would silently
    // alias plane i−64's bucket bit and degrade LSH recall unnoticed
    require(planes >= 1 && planes <= 64,
      s"planes must be in [1, 64] (sign bits pack into one long), got $planes")
    val dim = emb.select(size(col(vecCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"randomHyperplaneBuckets: empty input — cannot derive the embedding dim"))
    val rnd = new scala.util.Random(seed)
    val planeLits = (0 until planes).map { _ =>
      array((0 until dim).map(_ => lit(rnd.nextGaussian())): _*)
    }
    val bucket = planeLits.zipWithIndex.map { case (pl, i) =>
      when(dot(col(vecCol), pl) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    emb.withColumn("bucket", bucket)
  }

  /** IVF-style ANN: assign each vector to its nearest of `nCells`
    * sampled centroids (deterministic sample), then search only the
    * query's cell. The centroid matrix is tiny (nCells × dim), so it
    * collects once and inlines as LITERALS — cell assignment is then a
    * pure per-row argmax projection (array_max over (dot, cell)
    * structs): no crossJoin row blowup, no shuffle, no per-vector
    * window. The only shuffles left are the cell-key join and the
    * final per-query top-k. */
  /** The IVF index artifact: `nCells` centroid vectors by the
    * engine-portable deterministic sample — order by md5 of the id
    * rendered as a string (any engine computes the same hex, so the
    * DuckDB oracle picks identical centroids). Build ONCE per corpus
    * (one bounded nCells×dim collect), persist via
    * [[ModelIO.saveIvfCentroids]], reuse across every query batch —
    * the index-build/index-serve split a 100 TB embedding store needs. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): Array[(Int, Array[Float])] =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, seed: Long = 42L): DataFrame =
    ivfTopKWith(queries, corpus, idCol, vecCol, k,
      ivfCentroids(corpus, idCol, vecCol, nCells))

  /** Lloyd refinement for a sampled centroid set: each iteration
    * assigns every vector to its nearest centroid — `metric =
    * "spherical"` (default) is the normalized-dot argmax shared with
    * SemDedup/IVF ([[graft.operators.Dedup.clusterAssignAuto]], kernel
    * path above 32 cells); `"l2"` is the −2·v·c + cᵀc argmin that
    * [[pqCompress]] codes with — and replaces each centroid with its
    * members' per-dimension mean; empty cells keep their previous
    * centroid. Cost per iteration: ONE corpus scan + an
    * nCells×dim aggregation (map-side combined) + an nCells-row
    * collect — scale-safe at any corpus size. The sampled-centroid
    * path stays the deterministic/oracle-replicable default
    * (float-sum order across partitions makes refined means
    * run-dependent at the last ulp); refine when recall matters more
    * than replayability, then persist the result via
    * [[graft.operators.ModelIO.saveIvfCentroids]] so serving IS
    * deterministic against the frozen index. */
  /** Imperative L2 argmin assignment (−2·v·c + cᵀc; the vᵀv term is
    * per-row constant), strict `<` keeps the lowest cell on ties —
    * the metric [[pqCompress]] codes with, for L2-mode refinement. */
  private def l2AssignKernel(
      centroids: Array[(Int, Array[Float])]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cells = centroids.map(_._1.toLong)
    val mats = centroids.map(_._2.map(_.toDouble))
    val cn2 = mats.map(m => { var s = 0.0; var i = 0; while (i < m.length) { s += m(i) * m(i); i += 1 }; s })
    udf { (vec: Seq[Float]) =>
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < mats.length) {
        val m = mats(c)
        var d = 0.0
        var i = 0
        while (i < m.length) { d += vec(i).toDouble * m(i); i += 1 }
        d = d * -2.0 + cn2(c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      cells(best)
    }
  }

  def kmeansRefine(corpus: DataFrame, vecCol: String,
                   cents: Array[(Int, Array[Float])], iters: Int,
                   metric: String = "spherical"): Array[(Int, Array[Float])] = {
    require(cents.nonEmpty && iters >= 0, "need centroids and iters >= 0")
    require(metric == "spherical" || metric == "l2", s"unknown metric $metric")
    val dim = cents(0)._2.length
    var cur = cents
    var it = 0
    while (it < iters) {
      val assignCol =
        if (metric == "l2") l2AssignKernel(cur)(col(vecCol))
        else graft.operators.Dedup.clusterAssignAuto(col(vecCol), cur)
      val assigned = corpus.withColumn("__c", assignCol)
      val aggs = (0 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1)).as(s"__m$i"))
      val means = assigned.groupBy(col("__c")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0).toInt ->
          Array.tabulate(dim)(i => r.getDouble(i + 1).toFloat))
        .toMap
      cur = cur.map { case (c, v) => (c, means.getOrElse(c, v)) }
      it += 1
    }
    cur
  }

  /** [[ivfTopK]] against a prebuilt (possibly loaded) centroid index.
    * `nProbe` > 1 is the recall knob: each QUERY fans out to its
    * nProbe nearest cells (corpus vectors still live in exactly one
    * home cell), multiplying the probed fraction of the corpus by
    * nProbe while the scan stays bucket-local — the standard
    * IVF recall/cost trade at 100 TB. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  centroids: Array[(Int, Array[Float])],
                  nProbe: Int = 1): DataFrame = {
    // assignment metric = dot/‖c‖ (spherical): raw dots let the
    // largest-norm centroid swallow the corpus (measured 28% of 200k
    // vectors in ONE cell on uniform synthetic data — quadratic death
    // for any within-cell scan and a hot-cell probe for every query);
    // the row's own norm is per-row constant and can't change argmax
    val scoredCells = (v: String) => array(centroids.toIndexedSeq.map { case (cell, vec) =>
      struct((dot(col(v), lit(vec)) / lit(Dedup.centroidNorm(vec))).as("d"),
        lit(-cell).as("negc"))
    }: _*)
    // corpus-side argmax assignment via the shared auto-dispatching
    // helper: identical (d, -cell) argmax semantics, but above 32
    // cells it switches to the imperative kernel — the literal
    // array_max-over-structs form is a CodegenFallback interpreted
    // per row (~2.5 ms/row at 256 cells, Dedup.scala's measurement)
    val ca = corpus.select(col(idCol).as("n_id"), col(vecCol).as("__cv"))
      .withColumn("c_id", Dedup.clusterAssignAuto(col("__cv"), centroids))
      // zero-norm rows have no cosine direction — one would NaN-rank
      // as everyone's #1 neighbor (NaN sorts first in a desc order-by)
      .withColumn("__cn", norm(col("__cv"))).filter(col("__cn") > 0)
    // query side: descending struct sort = d desc, ties → lowest cell
    // (larger negc first); one probed cell per exploded row (queries
    // are the broadcast-small side — the literal form stays codegen'd
    // enough, and top-nProbe needs the full sorted cell list anyway)
    val qa = queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv"))
      .withColumn("__probe",
        explode(slice(reverse(sort_array(scoredCells("__qv"))), 1, nProbe)))
      .withColumn("c_id", (-col("__probe").getField("negc")).cast("long"))
      .drop("__probe")
      .withColumn("__qn", norm(col("__qv"))).filter(col("__qn") > 0)
    val scored = qa.join(ca, Seq("c_id")).filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim")
  }

  // ----- product quantization (the 100 TB embedding-compression path) -----

  /** PQ codebooks [subspace][centroid][subDim]: `k` whole vectors
    * drawn by the same engine-portable md5-ordered sample as
    * [[ivfTopK]], sliced into `m` contiguous subspaces. A sampled
    * codebook (no Lloyd refinement) keeps the construction
    * deterministic and oracle-replicable; swap in per-subspace k-means
    * when fidelity matters more than replayability. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int): Array[Array[Array[Double]]] = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(k)
      .collect()
    require(sample.length == k, s"corpus smaller than $k codebook entries")
    val dim = sample.head.getSeq[Float](1).length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sub = dim / m
    Array.tabulate(m, k) { (mi, j) =>
      sample(j).getSeq[Float](1).slice(mi * sub, (mi + 1) * sub)
        .map(_.toDouble).toArray
    }
  }

  /** Per-subspace Lloyd-refined codebooks — the "swap in k-means when
    * fidelity matters more than replayability" upgrade the sampled
    * [[pqCodebooks]] documents: each subspace's k sampled centroids
    * refine over the corpus SLICE via [[kmeansRefine]] (one scan +
    * k×subDim aggregation per subspace-iteration). Refine offline,
    * persist via [[graft.operators.ModelIO.savePqCodebooks]], and
    * serving against the frozen codebook stays deterministic. */
  def pqCodebooksRefined(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, k: Int, iters: Int): Array[Array[Array[Double]]] = {
    val base = pqCodebooks(corpus, idCol, vecCol, m, k)
    val sub = base(0)(0).length
    Array.tabulate(m) { mi =>
      val sliced = corpus.select(
        slice(col(vecCol), mi * sub + 1, sub).as("__sub"))
      val init = base(mi).zipWithIndex.map { case (c, j) => (j, c.map(_.toFloat)) }
      kmeansRefine(sliced, "__sub", init, iters, metric = "l2")
        .sortBy(_._1)
        .map(_._2.map(_.toDouble))
    }
  }

  /** Compress each vector to `m` small codes: per subspace, the argmin
    * centroid under L2 (ties → lowest index). 64 f32 dims at m=4
    * become 4 bytes — 64× smaller — and compression is a pure per-row
    * argmin projection over inlined centroid literals: no shuffle, no
    * join, scales linearly over a 100 TB embedding scan. The xᵀx term
    * is constant per (row, subspace) so the argmin metric is
    * -2·x·c + cᵀc. */
  def pqCompress(corpus: DataFrame, idCol: String, vecCol: String,
                 cb: Array[Array[Array[Double]]]): DataFrame = {
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    // Two projections, NOT array_min over a struct array: the struct
    // form is interpreted (CodegenFallback + per-row allocations,
    // measured ~1.2 ms/row). Stage 1 computes each centroid distance
    // ONCE as a named column; stage 2 takes the argmin with scalar
    // least + a first-match when-chain over those attributes (ties →
    // lowest index, same as the struct ordering). Catalyst keeps the
    // stages separate — CollapseProject declines to inline expensive
    // aliases referenced more than once — so the dots are never
    // duplicated into the comparison tree, and everything is plain
    // codegen'd arithmetic.
    val dists = for (mi <- 0 until m; j <- 0 until k) yield {
      val xsub = slice(col(vecCol), mi * sub + 1, sub)
      val c = cb(mi)(j)
      val cnorm = c.map(x => x * x).sum
      (dot(xsub, lit(c)) * -2.0 + cnorm).as(s"__d_${mi}_$j")
    }
    val staged = corpus.select(col(idCol).as("n_id") +: dists: _*)
    val codes = (0 until m).map { mi =>
      val ds = (0 until k).map(j => col(s"__d_${mi}_$j"))
      val mn = least(ds: _*)
      (0 until k - 1).foldRight(lit(k - 1): Column) { (j, acc) =>
        when(ds(j) === mn, j).otherwise(acc)
      }.as(s"code_$mi")
    }
    staged.select((col("n_id")) +: codes: _*)
  }

  /** PQ ANN top-k via asymmetric distance computation (ADC): each
    * query precomputes ONE m×k distance table (query-sub to every
    * centroid, full L2²), then every query-code pair costs just m
    * table lookups + m-1 adds — never touching the original corpus
    * floats. The compressed code table is the only corpus-sized input:
    * the scan that feeds the ranking is 64× narrower than the raw
    * embedding column. Approximation = distance to the RECONSTRUCTED
    * corpus vector; ranked ascending (ties → lowest neighbor id). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 4, kCent: Int = 8): DataFrame =
    pqTopKWith(queries, corpus, idCol, vecCol, k,
      pqCodebooks(corpus, idCol, vecCol, m, kCent))

  /** [[pqTopK]] against a prebuilt (possibly loaded) codebook — pair
    * with a persisted [[pqCompress]] code table to serve ANN queries
    * without ever rescanning the raw embeddings. */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 cb: Array[Array[Array[Double]]]): DataFrame = {
    val m = cb.length
    val kCent = cb(0).length
    val sub = cb(0)(0).length
    // exchange barrier between compression and the pair join: fused
    // into the join's codegen stage, the compress expressions would be
    // re-evaluated once per (query, vector) PAIR instead of once per
    // vector — an nq× waste (measured 218 s vs 9 s at 200k × 32). The
    // shuffled table is the narrow (id, m codes) frame, 64× smaller
    // than the embeddings.
    val codes = pqCompress(corpus, idCol, vecCol, cb).repartition(col("n_id"))
    val qt = (0 until m).foldLeft(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv"))) { (d, mi) =>
      val qsub = slice(col("__qv"), mi * sub + 1, sub)
      d.withColumn(s"__t_$mi", array((0 until kCent).map { j =>
        val c = cb(mi)(j)
        val cnorm = c.map(x => x * x).sum
        dot(qsub, qsub) + cnorm - dot(qsub, lit(c)) * 2.0
      }: _*))
    }.drop("__qv")
    val adist = (0 until m)
      .map(mi => element_at(col(s"__t_$mi"), col(s"code_$mi") + 1))
      .reduce(_ + _)
    codes.join(broadcast(qt), col("q_id") =!= col("n_id"))
      .withColumn("adist", adist)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "adist")
  }
}

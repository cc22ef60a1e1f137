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
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv"))))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
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
    val dim = emb.select(size(col(vecCol))).first().getInt(0)
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
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, seed: Long = 42L): DataFrame = {
    // pseudo-random but ENGINE-PORTABLE deterministic sample: order by
    // md5 of the id rendered as a string (any engine computes the same
    // hex, so the DuckDB oracle picks identical centroids)
    val centroids = corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
    val assign = (df: DataFrame, v: String) => {
      // argmax over (dot, -cell) structs = highest dot, ties → lowest cell
      val scoredCells = array(centroids.toIndexedSeq.map { case (cell, vec) =>
        struct(dot(col(v), lit(vec)).as("d"), lit(-cell).as("negc"))
      }: _*)
      df.withColumn("c_id", -array_max(scoredCells).getField("negc"))
    }
    val qa = assign(queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv")), "__qv")
      .withColumn("__qn", norm(col("__qv")))
    val ca = assign(corpus.select(col(idCol).as("n_id"), col(vecCol).as("__cv")), "__cv")
      .withColumn("__cn", norm(col("__cv")))
    val scored = qa.join(ca, Seq("c_id")).filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim")
  }
}

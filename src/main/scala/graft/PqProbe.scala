package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off PQ stage profiling (local aid). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => (pmod(xxhash64(col("id"), i), lit(997)).cast("double") / 997).cast("float"))
        .as("embedding"))
      .repartition(64).cache()
    println(s"[pq] vecs=${vecs.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val out = f
      println(f"[pq] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s out=$out")
    }
    time("brute cosine top-10 (soak order)") {
      Similarity.cosineTopK(vecs.filter(col("vec_id") < 32), vecs,
        "vec_id", "embedding", k = 10).count()
    }
    time("ivf top-10 (soak order)") {
      Similarity.ivfTopK(vecs.filter(col("vec_id") < 32), vecs,
        "vec_id", "embedding", k = 10, nCells = 16).count()
    }
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding", 4, 8)
    time("compress, forced materialization (sum of codes)") {
      Similarity.pqCompress(vecs, "vec_id", "embedding", cb)
        .agg(sum(col("code_0") + col("code_1") + col("code_2") + col("code_3")))
        .collect()(0).getLong(0)
    }
    time("pair join only (no window), count forces adist") {
      val codes = Similarity.pqCompress(vecs, "vec_id", "embedding", cb)
      val q = vecs.filter(col("vec_id") < 32)
        .select(col("vec_id").as("q_id"), col("embedding").as("__qv"))
      codes.join(broadcast(q), col("q_id") =!= col("n_id"))
        .agg(sum(col("code_0"))).collect()(0).getLong(0)
    }
    import org.apache.spark.sql.expressions.Window
    val qt0 = (0 until 4).foldLeft(
      vecs.filter(col("vec_id") < 32)
        .select(col("vec_id").as("q_id"), col("embedding").as("__qv"))) { (d, mi) =>
      val qsub = slice(col("__qv"), mi * 16 + 1, 16)
      d.withColumn(s"__t_$mi", array((0 until 8).map { j =>
        val c = cb(mi)(j)
        val cnorm = c.map(x => x * x).sum
        Similarity.dot(qsub, qsub) + cnorm - Similarity.dot(qsub, lit(c)) * 2.0
      }: _*))
    }.drop("__qv")
    val adist0 = (0 until 4)
      .map(mi => element_at(col(s"__t_$mi"), col(s"code_$mi") + 1))
      .reduce(_ + _)
    time("A: join+adist+window over CHECKPOINTED codes") {
      val codes = Similarity.pqCompress(vecs, "vec_id", "embedding", cb).localCheckpoint()
      codes.join(broadcast(qt0), col("q_id") =!= col("n_id"))
        .withColumn("adist", adist0)
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("n_id"))))
        .filter(col("rnk") <= 10).count()
    }
    time("B: join+adist, NO window, lazy codes") {
      val codes = Similarity.pqCompress(vecs, "vec_id", "embedding", cb)
      codes.join(broadcast(qt0), col("q_id") =!= col("n_id"))
        .withColumn("adist", adist0)
        .agg(sum(col("adist"))).collect()(0).getDouble(0).toLong
    }
    time("full pqTopK (barrier + staged argmin)") {
      Similarity.pqTopK(vecs.filter(col("vec_id") < 32), vecs,
        "vec_id", "embedding", k = 10, m = 4, kCent = 8).count()
    }
    spark.stop()
  }
}

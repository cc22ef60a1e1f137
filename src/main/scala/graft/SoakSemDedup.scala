package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused soak for the SemDedup kernel-assignment path (round 5):
  * the interpreted struct-argmax at 256 cells measured 722 s over
  * 200k vectors; the imperative kernel should bring the stage to
  * seconds. Usage: runMain graft.SoakSemDedup [nVecs] [nClusters] */
object SoakSemDedup {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(200000)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
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
      .repartition(64)
      .cache()
    println(s"[semsoak] vecs=${vecs.count()}")
    // cluster-size skew diagnostic: the pair scan is Σ cᵢ², so one
    // giant cluster is quadratic death
    val cents = Dedup.sampleCentroids(vecs, "vec_id", "embedding", nClusters)
    val sizes = vecs.withColumn("c", Dedup.clusterAssignAuto(col("embedding"), cents))
      .groupBy("c").count().agg(max("count"), expr("percentile(count, 0.5)"),
        count(lit(1))).collect()(0)
    println(s"[semsoak] cluster sizes: max=${sizes.get(0)} median=${sizes.get(1)} " +
      s"nonEmpty=${sizes.get(2)} of $nClusters")
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val dups = Dedup.semDedup(vecs, "vec_id", "embedding", nClusters, tau = 0.9)
        .filter(col("is_dup")).count()
      println(f"[semsoak] rep$rep semDedup($nClusters clusters): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s (dups=$dups)")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Phase-level timing probe for the d_neardup_groups pipeline (cold
  * JIT). Times sigs / pairs / groups / final join separately to find
  * where the first-execution cost lands. */
object ProbeNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = t("docs read+count") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet"); d.count(); d
    }
    val sigs = t("sigs (md5, persist+count)") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, family = Dedup.HashFamily.Md5).persist()
      s.count(); s
    }
    val pairs = t("candidate pairs count") {
      // ids-only path — what d_neardup_groups actually executes (the
      // est_jaccard signature join-back variant is a different pipeline)
      val p = Dedup.minhashCandidatePairIds(sigs, "doc_id", numHashes = 16, rowsPerBand = 4)
      println("pairs=" + p.count()); p
    }
    val groups = t("nearDupGroups") {
      val g = Dedup.nearDupGroups(pairs.select("a", "b")); g.count(); g
    }
    t("final join") {
      docs.select(col("doc_id"))
        .join(groups.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("group"), col("doc_id")).as("group"))
        .withColumn("keep", col("doc_id") === col("group")).count()
    }
    spark.stop()
  }
}

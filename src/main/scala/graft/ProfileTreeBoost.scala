package graft
import graft.core.Panel
import org.apache.spark.sql.SparkSession

/** Probe for the fc_gbt cold-compile fix: fit TreeBoost on a 512-row
  * events-shaped panel first (the Bench warmup), then time the
  * sf-scale fit+predict in the same JVM. With StableConst keeping the
  * generated sources dataset-invariant, the timed run should match
  * BenchOne's WARM reps (~5.5 s), not its cold rep1 (~16 s). */
object ProfileTreeBoost {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ptb] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    t("tiny warmup (events-shaped, lags=7 bins=8 rounds=5)") {
      val edf = spark.range(512).select(
        col("id").as("event_id"),
        expr("timestampadd(DAY, CAST(id / 8 AS INT), timestamp'2020-01-01 00:00:00')").as("ts"),
        (col("id") % 8).as("user_id"),
        lit("warm").as("event_type"),
        (col("id") % 11).cast("double").as("value"),
        lit("{}").as("props"))
      val ep = Panel(edf, Seq("user_id"), Seq("ts", "event_id"), "value")
      graft.operators.TreeBoost.fit(ep, lags = 7, freq = "1d",
        rounds = 5, bins = 8, eta = 0.3).predict(ep, "ts", fh = 3).count()
    }
    (1 to 2).foreach { rep =>
      val p = t(s"rep$rep load")(Panel.events(spark, sfDir))
      val m = t(s"rep$rep fit")(graft.operators.TreeBoost.fit(p, lags = 7, freq = "1d", rounds = 5, bins = 8, eta = 0.3))
      t(s"rep$rep predict")(m.predict(p, "ts", fh = 3).rdd.count())
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}

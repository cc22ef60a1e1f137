package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the elite path — per-phase wall times. */
object ProfileElite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val ev = graft.core.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val p = graft.core.Panel(ev, Seq("user_id"), Seq("ts", "event_id"), "value")
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val cached = p.copy(df = p.df.cache())
      val sharedLag = time("sharedLag build+cache")(
        CrossValidation.withPosition(
          cached.copy(df = Preprocess.lagKeepAll(cached, 1 to 14))).cache())
      time("sharedLag materialize")(sharedLag.count())
      val bt7 = time("backtestLinearPrefix(7)")(
        AutoForecast.backtestLinearPrefix(cached, "ts", 7, 10, 2, 5,
          preAssembled = Some(sharedLag)))
      val bt14 = time("backtestLinearPrefix(14)")(
        AutoForecast.backtestLinearPrefix(cached, "ts", 14, 10, 2, 5,
          preAssembled = Some(sharedLag)))
      time("btNaive")(AutoForecast.backtestNaivePrefix(cached, "ts", 1, 10, 2, 5).count())
      time("btSnaive")(AutoForecast.backtestNaivePrefix(cached, "ts", 7, 10, 2, 5).count())
      time("score bt7")(bt7.groupBy("user_id").agg(avg("pred")).count())
      val m7 = time("fitLinearShared(7)") {
        graft.functions.Ols.fit(sharedLag.filter(col("__rn") > 7),
          (1 to 7).map(l => s"value__lag_$l"), "value")
      }
      val m14 = time("fitLinearShared(14)") {
        graft.functions.Ols.fit(sharedLag.filter(col("__rn") > 14),
          (1 to 14).map(l => s"value__lag_$l"), "value")
      }
      val _ = (m7, m14)
      time("full elite()")(
        AutoForecast.elite(p, "ts", "1d", fh = 3, topK = 2, nSplits = 2).count())
      sharedLag.unpersist(blocking = true)
      cached.df.unpersist(blocking = true)
    }
    spark.stop()
  }
}

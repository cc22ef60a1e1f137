package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for the censored forecaster (round-5 regression
  * hunt): reduction materialize, IRLS, above-threshold OLS, predict. */
object ProfileCensored {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val p = graft.core.Panel.events(spark, sfDir)
      val red = time("reduction+cache+count") {
        val r = graft.operators.Forecasters.makeReduction(p, 7)
          .na.drop((1 to 7).map(l => s"value__lag_$l") :+ "value")
          .withColumn("__above", (col("value") > 100.0).cast("double")).cache()
        r.count()
      }
      println(s"  rows=$red")
      val r2 = graft.operators.Forecasters.makeReduction(p, 7)
        .na.drop((1 to 7).map(l => s"value__lag_$l") :+ "value")
        .withColumn("__above", (col("value") > 100.0).cast("double"))
      val above = time("above-count") { r2.filter(col("value") > 100.0).count() }
      println(s"  above=$above")
      val irls = time("irls") {
        graft.functions.Logistic.fitIrls(r2, (1 to 7).map(l => s"value__lag_$l"), "__above")
      }
      time("ols-above") {
        graft.functions.Ols.fit(r2.filter(col("value") > 100.0),
          (1 to 7).map(l => s"value__lag_$l"), "value")
      }
      val model = time("full-fit") {
        graft.operators.CensoredForecaster.fit(p, lags = 7, freq = "1d", threshold = 100.0)
      }
      time("predict+count") { model.predict(p, "ts", fh = 3).count() }
    }
    spark.stop()
  }
}

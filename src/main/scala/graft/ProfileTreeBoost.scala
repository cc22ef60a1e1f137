package graft
import graft.core.Panel
import org.apache.spark.sql.SparkSession
object ProfileTreeBoost {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ptb] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      val p = t(s"rep$rep load")(Panel.events(spark, sfDir))
      val m = t(s"rep$rep fit")(graft.operators.TreeBoost.fit(p, lags = 7, freq = "1d", rounds = 5, bins = 8, eta = 0.3))
      t(s"rep$rep predict")(m.predict(p, "ts", fh = 3).rdd.count())
    }
    spark.stop()
  }
}

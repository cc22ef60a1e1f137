package graft

import graft.core.Panel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + panel fixtures for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** One entity per series, time = 0..n-1. */
  def panel(series: Seq[Double]*): Panel = {
    import spark.implicits._
    val rows = series.zipWithIndex.flatMap { case (s, e) =>
      s.zipWithIndex.map { case (v, t) => (e, t, v) }
    }
    Panel(rows.toDF("entity", "t", "value"), Seq("entity"), Seq("t"), "value")
  }

  /** Single scalar feature value for entity 0 from a (entity, feature) frame. */
  def featVal(df: DataFrame, name: String): Double = {
    val r = df.filter(df("entity") === 0).select(name).collect()(0)
    if (r.isNullAt(0)) Double.NaN
    else r.get(0) match {
      case d: Double => d
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case b: Boolean => if (b) 1.0 else 0.0
      case x => x.toString.toDouble
    }
  }

  def assertClose(got: Double, want: Double, tol: Double = 1e-6): Unit = {
    if (want.isNaN) assert(got.isNaN, s"expected NaN, got $got")
    else if (want.isInfinite) assert(got == want, s"expected $want, got $got")
    else assert(math.abs(got - want) <= tol, s"expected $want, got $got")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // 4 MB Tungsten pages: the default scales to 64 MB at large
      // heaps, exceeding half of G1's 32 MB max region size — every
      // page then allocates as G1-humongous and GC time explodes
      // (observed 10-20x slowdowns at 64g heaps)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

package graft

import graft.core.Panel
import graft.operators.Preprocess
import org.apache.spark.sql.functions._

/** Randomized round trips: invert(transform(x)) == x for seeded random
  * panels — the reference's transform/invert contract
  * (preprocessing.py `invert`) must hold on ANY series, not just the
  * fixtures. (Seeded generation: deterministic CI.) */
class InvertPropertySpec extends SparkSpec {

  private def randomSeries(rnd: scala.util.Random, minLen: Int): List[Double] = {
    val n = minLen + rnd.nextInt(16)
    List.fill(n)(math.rint((rnd.nextDouble() * 2 - 1) * 1e6) / 100)
  }

  private def mkPanel(series: Seq[List[Double]]): Panel = {
    import spark.implicits._
    val rows = series.zipWithIndex.flatMap { case (s, e) =>
      s.zipWithIndex.map { case (v, t) => (e.toLong, t.toLong, v) }
    }
    Panel(rows.toDF("entity", "t", "value"), Seq("entity"), Seq("t"), "value")
  }

  private def values(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select("entity", "t", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2)).toSeq

  private def assertRoundTrip(got: Seq[(Long, Long, Double)],
                              want: Seq[(Long, Long, Double)], tol: Double): Unit = {
    assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
    got.zip(want).foreach { case ((e1, t1, g), (e2, t2, w)) =>
      assert(e1 == e2 && t1 == t2, s"key mismatch ($e1,$t1) vs ($e2,$t2)")
      assert(math.abs(g - w) < tol * math.max(1.0, math.abs(w)), s"$g vs $w at ($e1,$t1)")
    }
  }

  test("scale/invert round-trips on 5 random seeded panels") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val p = mkPanel(Seq.fill(2)(randomSeries(rnd, minLen = 4)))
      val (scaled, art) = Preprocess.scale(p)
      assertRoundTrip(values(Preprocess.scaleInvert(scaled, art, Seq("entity"), "value")),
        values(p.df), 1e-9)
    }
  }

  test("diff/invert round-trips for orders {1,2} x sp {1,3} on random panels") {
    for (seed <- 1 to 3; order <- Seq(1, 2); sp <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed * 100 + order * 10 + sp)
      val p = mkPanel(Seq.fill(2)(randomSeries(rnd, minLen = order * sp + 4)))
      val (diffed, heads) = Preprocess.diff(p, order = order, sp = sp)
      assertRoundTrip(
        values(Preprocess.diffInvert(diffed, heads, Seq("entity"), Seq("t"), "value", sp)),
        values(p.df), 1e-9)
    }
  }

  test("boxcox/invert round-trips on random positive panels") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pos = randomSeries(rnd, minLen = 6).map(v => math.abs(v) + 1.0)
      val p = mkPanel(Seq(pos))
      val lambda = 0.3
      val fwd = p.df.withColumn("value",
        (pow(col("value"), lambda) - 1) / lambda)
      val back = fwd.withColumn("value",
        Preprocess.boxcoxInvert(col("value"), lit(lambda)))
      assertRoundTrip(values(back), values(p.df), 1e-8)
    }
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Fitted-model serialization round-trips — the analog of the
  * reference's cloudpickle tests (tests/test_forecasting.py:71-105):
  * save → load → predict must be BIT-identical, not merely close. */
class ModelIOSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"modelio_$name").toString

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("entity", "t").collect().map(_.toSeq.toIndexedSeq).toIndexedSeq

  private val signal = (0 until 40).map(t => 50 + 20 * math.sin(0.3 * t) + (t % 5))

  test("linear model round-trips bit-identically") {
    val p = panel(signal)
    val m = LinearForecaster.fit(p, lags = 3, freq = "1i")
    val path = tmp("linear") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadLinear(path)
    assert(l == m.copy(weights = l.weights) && l.weights.sameElements(m.weights))
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("direct + ensemble models round-trip bit-identically") {
    val p = panel(signal)
    val dir = LinearForecaster.fitDirect(p, lags = 3, fh = 3, freq = "1i")
    val dPath = tmp("direct") + "/m.json"
    ModelIO.save(dir, dPath)
    assert(rows(ModelIO.loadDirect(dPath).predict(p, "t", 3))
      == rows(dir.predict(p, "t", 3)))
    val ens = EnsembleLinearModel(LinearForecaster.fit(p, 3, "1i"), dir)
    val ePath = tmp("ensemble")
    ModelIO.save(ens, ePath)
    assert(rows(ModelIO.loadEnsemble(ePath).predict(p, "t", 3))
      == rows(ens.predict(p, "t", 3)))
  }

  test("censored model round-trips bit-identically") {
    val p = panel(signal)
    val m = CensoredForecaster.fit(p, lags = 3, freq = "1i", threshold = 55.0)
    val path = tmp("censored") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadCensored(path)
    assert(l.pIntercept == m.pIntercept && l.rIntercept == m.rIntercept)
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("stump-boost model round-trips bit-identically") {
    val p = panel(signal)
    val m = StumpBoost.fit(p, lags = 3, freq = "1i", rounds = 4, bins = 8)
    val path = tmp("stump") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadStump(path)
    assert(l.stumps == m.stumps && l.b0 == m.b0)
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("tree-boost model round-trips bit-identically") {
    val p = panel(signal)
    val m = TreeBoost.fit(p, lags = 3, freq = "1i", rounds = 3, bins = 8)
    val path = tmp("tree") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadTree(path)
    assert(l.trees == m.trees && l.b0 == m.b0)
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("tree-boost log-link objective survives the round trip") {
    // a poisson model reloaded as l2 would emit the raw log-scale
    // score instead of exp(F) — the objective must persist
    val p = panel(signal.map(v => math.abs(v) + 1.0))
    val m = TreeBoost.fit(p, lags = 3, freq = "1i", rounds = 2, bins = 4,
      objective = "poisson")
    val path = tmp("tree_pois") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadTree(path)
    assert(l.objective == "poisson")
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("MLlib GBT model round-trips via the native writer") {
    val p = panel(signal)
    val m = GbtForecaster.fit(p, lags = 3, freq = "1i", maxIter = 3, maxDepth = 2)
    val path = tmp("gbt")
    ModelIO.save(m, path)
    val l = ModelIO.loadGbt(path)
    assert(l.lags == m.lags && l.freq == m.freq)
    assert(rows(l.predict(p, "t", 3)) == rows(m.predict(p, "t", 3)))
  }

  test("exog model round-trips bit-identically") {
    // panel + a deterministic exogenous regressor
    val p0 = panel(signal)
    import org.apache.spark.sql.functions._
    val withX = p0.copy(df = p0.df.withColumn("x1",
      (col("t") % 7).cast("double") / 6.0))
    val m = ExogLinear.fit(withX, lags = 3, freq = "1i", exogCols = Seq("x1"))
    val path = tmp("exog") + "/m.json"
    ModelIO.save(m, path)
    val l = ModelIO.loadExog(path)
    assert(l.exogCols == m.exogCols && l.intercept == m.intercept)
    val xf = SparkSpec.session.range(3).select(
      lit(0).cast("int").as("entity"),
      (col("id") + 40).cast("int").as("t"),
      (((col("id") + 40) % 7).cast("double") / 6.0).as("x1"))
    assert(rows(l.predict(p0, "t", 3, xf)) == rows(m.predict(p0, "t", 3, xf)))
  }

  test("ANN index artifacts round-trip bit-identically and serve identical top-k") {
    import SparkSpec.session.implicits._
    import org.apache.spark.sql.functions._
    val vecs = SparkSpec.session.range(64).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64($"id" * 131 + i), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("embedding"))
    val q = vecs.filter($"vec_id" < 4)
    // IVF centroids
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nCells = 4)
    val cPath = tmp("ivf") + "/cents.json"
    ModelIO.saveIvfCentroids(cents, cPath)
    val lc = ModelIO.loadIvfCentroids(cPath)
    assert(lc.length == cents.length &&
      lc.zip(cents).forall { case ((c1, v1), (c2, v2)) =>
        c1 == c2 && v1.sameElements(v2) })
    val fresh = Similarity.ivfTopKWith(q, vecs, "vec_id", "embedding", 3, cents)
      .collect().map(_.toSeq).toSeq
    val served = Similarity.ivfTopKWith(q, vecs, "vec_id", "embedding", 3, lc)
      .collect().map(_.toSeq).toSeq
    assert(fresh == served)
    // PQ codebooks
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 8)
    val pPath = tmp("pq") + "/cb.json"
    ModelIO.savePqCodebooks(cb, pPath)
    val lcb = ModelIO.loadPqCodebooks(pPath)
    assert(lcb.length == cb.length && lcb.zip(cb).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    val pqFresh = Similarity.pqTopKWith(q, vecs, "vec_id", "embedding", 3, cb)
      .collect().map(_.toSeq).toSeq
    val pqServed = Similarity.pqTopKWith(q, vecs, "vec_id", "embedding", 3, lcb)
      .collect().map(_.toSeq).toSeq
    assert(pqFresh == pqServed)
  }

  test("loading a mismatched type fails actionably") {
    val p = panel(signal)
    val m = LinearForecaster.fit(p, lags = 3, freq = "1i")
    val path = tmp("mismatch") + "/m.json"
    ModelIO.save(m, path)
    val e = intercept[IllegalArgumentException](ModelIO.loadCensored(path))
    assert(e.getMessage.contains("linear"))
  }
}

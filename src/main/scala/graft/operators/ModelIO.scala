package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Save/load for fitted forecaster models — the analog of the
  * reference's cloudpickle round-trip (tests/test_forecasting.py:71-105:
  * a fitted forecaster must survive serialization and predict
  * identically).
  *
  * Coefficients are stored as IEEE-754 raw bit patterns (JSON longs)
  * alongside a human-readable decimal rendering, so a load → predict is
  * BIT-identical to the pre-save model — no decimal round-trip risk.
  * The MLlib GBT ensemble uses MLlib's native writer (a parquet
  * directory) with a sidecar meta.json for the panel parameters; on a
  * cluster those paths are any Hadoop-compatible filesystem.
  */
object ModelIO {

  private val mapper = new ObjectMapper()

  // Hadoop-FS I/O, not java.nio: the MLlib ensemble writer already
  // resolves s3://... or hdfs://... schemes, and a java.nio sidecar
  // would silently land on the DRIVER'S LOCAL DISK (Paths.get("s3://…")
  // resolves as a relative local path named "s3:") — the saved model
  // would split-brain across filesystems. Schemeless paths resolve to
  // the default FS exactly like before.
  private def hadoopConf =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      // a bare `new Configuration()` would silently drop every
      // spark.hadoop.* setting (credentials, endpoints, default FS)
      // and resolve schemes against defaults — fail loud instead
      .getOrElse(throw new IllegalStateException(
        "ModelIO needs an active SparkSession: filesystem schemes and " +
          "credentials resolve through its hadoopConfiguration " +
          "(spark.hadoop.*); a default Configuration could read/write " +
          "the wrong filesystem"))

  private def writeJson(node: ObjectNode, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(hadoopConf)
    Option(hp.getParent).foreach(fs.mkdirs)
    val out = fs.create(hp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
  }

  private def readJson(path: String): ObjectNode = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(hadoopConf)
    val in = fs.open(hp)
    try mapper.readTree(in).asInstanceOf[ObjectNode]
    finally in.close()
  }

  private def putD(n: ObjectNode, key: String, v: Double): Unit = {
    n.put(key, java.lang.Double.doubleToRawLongBits(v))
    n.put(key + "_readable", v)
  }
  private def getD(n: ObjectNode, key: String): Double =
    java.lang.Double.longBitsToDouble(n.get(key).asLong())

  private def putDs(n: ObjectNode, key: String, vs: Array[Double]): Unit = {
    val arr = n.putArray(key)
    vs.foreach(v => arr.add(java.lang.Double.doubleToRawLongBits(v)))
    val r = n.putArray(key + "_readable")
    vs.foreach(v => r.add(v))
  }
  private def getDs(n: ObjectNode, key: String): Array[Double] = {
    val arr = n.get(key).asInstanceOf[ArrayNode]
    Array.tabulate(arr.size())(i =>
      java.lang.Double.longBitsToDouble(arr.get(i).asLong()))
  }

  private def expect(n: ObjectNode, t: String): Unit = {
    // a foreign/malformed JSON without a "type" key must hit the
    // descriptive require, not NPE inside the message that explains it
    val typ = Option(n.get("type")).map(_.asText()).getOrElse("<missing>")
    require(typ == t, s"model file holds type '$typ', expected '$t'")
  }

  // ----- recursive linear -----

  def save(m: LinearForecasterModel, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "linear")
    putD(n, "intercept", m.intercept)
    putDs(n, "weights", m.weights)
    n.put("lags", m.lags); n.put("freq", m.freq)
    writeJson(n, path)
  }

  def loadLinear(path: String): LinearForecasterModel = {
    val n = readJson(path); expect(n, "linear")
    LinearForecasterModel(getD(n, "intercept"), getDs(n, "weights"),
      n.get("lags").asInt(), n.get("freq").asText())
  }

  // ----- direct multi-horizon -----

  def save(m: DirectLinearModel, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "direct")
    n.put("lags", m.lags); n.put("freq", m.freq)
    val hs = n.putArray("horizons")
    m.models.foreach { case (b0, w) =>
      val h = hs.addObject()
      putD(h, "intercept", b0)
      putDs(h, "weights", w)
    }
    writeJson(n, path)
  }

  def loadDirect(path: String): DirectLinearModel = {
    val n = readJson(path); expect(n, "direct")
    val hs = n.get("horizons").asInstanceOf[ArrayNode]
    val models = (0 until hs.size()).map { i =>
      val h = hs.get(i).asInstanceOf[ObjectNode]
      (getD(h, "intercept"), getDs(h, "weights"))
    }
    DirectLinearModel(models, n.get("lags").asInt(), n.get("freq").asText())
  }

  // ----- recursive ⊕ direct ensemble -----

  def save(m: EnsembleLinearModel, path: String): Unit = {
    save(m.rec, path + "/rec.json")
    save(m.dir, path + "/dir.json")
  }

  def loadEnsemble(path: String): EnsembleLinearModel =
    EnsembleLinearModel(loadLinear(path + "/rec.json"), loadDirect(path + "/dir.json"))

  // ----- exogenous linear -----

  def save(m: ExogLinear.Model, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "exog_linear")
    putD(n, "intercept", m.intercept)
    putDs(n, "lagW", m.lagW)
    putDs(n, "exogW", m.exogW)
    n.put("lags", m.lags); n.put("freq", m.freq)
    val ec = n.putArray("exogCols"); m.exogCols.foreach(c => ec.add(c))
    writeJson(n, path)
  }

  def loadExog(path: String): ExogLinear.Model = {
    val n = readJson(path); expect(n, "exog_linear")
    val ec = n.get("exogCols").asInstanceOf[ArrayNode]
    ExogLinear.Model(getD(n, "intercept"), getDs(n, "lagW"), getDs(n, "exogW"),
      n.get("lags").asInt(), n.get("freq").asText(),
      (0 until ec.size()).map(ec.get(_).asText()))
  }

  // ----- censored / zero-inflated -----

  def save(m: CensoredForecaster.Model, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "censored")
    putD(n, "pIntercept", m.pIntercept)
    putDs(n, "pWeights", m.pWeights)
    putD(n, "rIntercept", m.rIntercept)
    putDs(n, "rWeights", m.rWeights)
    n.put("lags", m.lags); n.put("freq", m.freq)
    writeJson(n, path)
  }

  def loadCensored(path: String): CensoredForecaster.Model = {
    val n = readJson(path); expect(n, "censored")
    CensoredForecaster.Model(getD(n, "pIntercept"), getDs(n, "pWeights"),
      getD(n, "rIntercept"), getDs(n, "rWeights"),
      n.get("lags").asInt(), n.get("freq").asText())
  }

  // ----- stump boosting -----

  def save(m: StumpBoost.Model, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "stump_boost")
    putD(n, "b0", m.b0)
    n.put("lags", m.lags); n.put("freq", m.freq)
    val ss = n.putArray("stumps")
    m.stumps.foreach { s =>
      val sn = ss.addObject()
      sn.put("feat", s.feat)
      putD(sn, "thr", s.thr); putD(sn, "vl", s.vl); putD(sn, "vr", s.vr)
    }
    writeJson(n, path)
  }

  def loadStump(path: String): StumpBoost.Model = {
    val n = readJson(path); expect(n, "stump_boost")
    val ss = n.get("stumps").asInstanceOf[ArrayNode]
    val stumps = (0 until ss.size()).map { i =>
      val sn = ss.get(i).asInstanceOf[ObjectNode]
      StumpBoost.Stump(sn.get("feat").asInt(),
        getD(sn, "thr"), getD(sn, "vl"), getD(sn, "vr"))
    }
    StumpBoost.Model(getD(n, "b0"), stumps, n.get("lags").asInt(), n.get("freq").asText())
  }

  // ----- depth-2 tree boosting -----

  def save(m: TreeBoost.Model, path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "tree_boost")
    putD(n, "b0", m.b0)
    n.put("lags", m.lags); n.put("freq", m.freq)
    n.put("objective", m.objective)
    val ts = n.putArray("trees")
    m.trees.foreach { t =>
      val tn = ts.addObject()
      tn.put("fi", t.fi); putD(tn, "thr", t.thr)
      tn.put("fl", t.fl); putD(tn, "tl", t.tl)
      putD(tn, "vll", t.vll); putD(tn, "vlr", t.vlr)
      tn.put("fr", t.fr); putD(tn, "tr", t.tr)
      putD(tn, "vrl", t.vrl); putD(tn, "vrr", t.vrr)
    }
    writeJson(n, path)
  }

  def loadTree(path: String): TreeBoost.Model = {
    val n = readJson(path); expect(n, "tree_boost")
    val ts = n.get("trees").asInstanceOf[ArrayNode]
    val trees = (0 until ts.size()).map { i =>
      val tn = ts.get(i).asInstanceOf[ObjectNode]
      TreeBoost.Tree2(tn.get("fi").asInt(), getD(tn, "thr"),
        tn.get("fl").asInt(), getD(tn, "tl"), getD(tn, "vll"), getD(tn, "vlr"),
        tn.get("fr").asInt(), getD(tn, "tr"), getD(tn, "vrl"), getD(tn, "vrr"))
    }
    TreeBoost.Model(getD(n, "b0"), trees, n.get("lags").asInt(), n.get("freq").asText(),
      // models saved before the objective field existed are l2
      if (n.has("objective")) n.get("objective").asText() else "l2")
  }

  // ----- MLlib GBT (native writer + sidecar meta) -----

  def save(m: GbtForecaster.Model, path: String): Unit = {
    m.model.write.overwrite().save(path + "/ensemble")
    val n = mapper.createObjectNode()
    n.put("type", "gbt")
    n.put("lags", m.lags); n.put("freq", m.freq)
    writeJson(n, path + "/meta.json")
  }

  def loadGbt(path: String): GbtForecaster.Model = {
    val n = readJson(path + "/meta.json"); expect(n, "gbt")
    GbtForecaster.Model(
      org.apache.spark.ml.regression.GBTRegressionModel.load(path + "/ensemble"),
      n.get("lags").asInt(), n.get("freq").asText())
  }

  // ----- ANN index artifacts (build once, serve many) -----

  /** IVF centroid index ([[Similarity.ivfCentroids]]): f32 vectors as
    * raw int bits — a load → [[Similarity.ivfTopKWith]] assigns and
    * ranks BIT-identically to the session that built the index. */
  def saveIvfCentroids(cents: Array[(Int, Array[Float])], path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "ivf_centroids")
    val arr = n.putArray("cells")
    cents.foreach { case (cell, vec) =>
      val cn = arr.addObject()
      cn.put("cell", cell)
      val vb = cn.putArray("vec")
      vec.foreach(v => vb.add(java.lang.Float.floatToRawIntBits(v)))
    }
    writeJson(n, path)
  }

  def loadIvfCentroids(path: String): Array[(Int, Array[Float])] = {
    val n = readJson(path); expect(n, "ivf_centroids")
    val arr = n.get("cells").asInstanceOf[ArrayNode]
    Array.tabulate(arr.size()) { i =>
      val cn = arr.get(i).asInstanceOf[ObjectNode]
      val vb = cn.get("vec").asInstanceOf[ArrayNode]
      (cn.get("cell").asInt(),
        Array.tabulate(vb.size())(j =>
          java.lang.Float.intBitsToFloat(vb.get(j).asInt())))
    }
  }

  /** PQ codebooks ([[Similarity.pqCodebooks]], [subspace][centroid]
    * [subDim] doubles as raw long bits): persist alongside the
    * [[Similarity.pqCompress]] code table and serve ANN top-k without
    * rescanning raw embeddings ([[Similarity.pqTopKWith]]). */
  def savePqCodebooks(cb: Array[Array[Array[Double]]], path: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("type", "pq_codebooks")
    val ms = n.putArray("subspaces")
    cb.foreach { cents =>
      val cs = ms.addArray()
      cents.foreach { c =>
        val vb = cs.addArray()
        c.foreach(v => vb.add(java.lang.Double.doubleToRawLongBits(v)))
      }
    }
    writeJson(n, path)
  }

  def loadPqCodebooks(path: String): Array[Array[Array[Double]]] = {
    val n = readJson(path); expect(n, "pq_codebooks")
    val ms = n.get("subspaces").asInstanceOf[ArrayNode]
    Array.tabulate(ms.size()) { mi =>
      val cs = ms.get(mi).asInstanceOf[ArrayNode]
      Array.tabulate(cs.size()) { j =>
        val vb = cs.get(j).asInstanceOf[ArrayNode]
        Array.tabulate(vb.size())(d =>
          java.lang.Double.longBitsToDouble(vb.get(d).asLong()))
      }
    }
  }
}

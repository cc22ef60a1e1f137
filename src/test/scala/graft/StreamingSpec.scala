package graft

import graft.streaming.StreamingPanel
import graft.streaming.StreamingPanel.In
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming extension: windowed features and online CUSUM
  * vs their batch equivalents. */
class StreamingSpec extends SparkSpec {

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("windowed feature agg over a stream matches the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rows = (0 until 30).map(i => (i % 2L, ts(i), (i + 1).toDouble))
    mem.addData(rows: _*)
    val stream = mem.toDF.toDF("entity", "event_time", "value")
    val out = StreamingPanel.windowedFeatures(stream, "entity", "event_time",
      watermark = "5 minutes", windowDuration = "10 minutes", slideDuration = "10 minutes",
      aggs = Seq(sum(col("value") * col("value")).as("absolute_energy"),
        sqrt(avg(col("value") * col("value"))).as("rms")))
    val q = out.writeStream.format("memory").queryName("wf").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wf")
    val want = stream.isStreaming // just for clarity; batch equivalent below
    val batch = rows.toDF("entity", "event_time", "value")
      .groupBy(col("entity"), window(col("event_time"), "10 minutes"))
      .agg(sum(col("value") * col("value")).as("absolute_energy"),
        sqrt(avg(col("value") * col("value"))).as("rms"))
    assert(got.count() == batch.count())
    val g = got.select("entity", "absolute_energy").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = batch.select("entity", "absolute_energy").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(g == b)
  }

  test("streaming CUSUM fires at the same points as the batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // level shift at index 20: warmup 10 on N(0)-ish flat, jump to 50
    val vals = (0 until 20).map(i => Seq(1.0, 2.0, 1.5, 0.5)(i % 4)) ++ Seq.fill(10)(50.0)
    val batchEvents = graft.functions.Kernels.cusum(vals.toArray, 5.0, 10, 0.0)
    val mem = MemoryStream[In]
    mem.addData(vals.zipWithIndex.map { case (v, i) => In(0L, ts(i), v) }: _*)
    val out = StreamingPanel.streamingCusum(mem.toDS(), threshold = 5.0, warmupPeriod = 10, drift = 0.0)
    val q = out.writeStream.format("memory").queryName("cp").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val gotTimes = spark.table("cp").collect().map(_.getAs[java.sql.Timestamp]("eventTime")).toSet
    val wantTimes = batchEvents.zipWithIndex.collect { case (1, i) => ts(i) }.toSet
    assert(wantTimes.nonEmpty, "fixture should contain a changepoint")
    assert(gotTimes == wantTimes)
  }

  test("streaming CUSUM carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vals = (0 until 20).map(i => Seq(1.0, 2.0, 1.5, 0.5)(i % 4)) ++ Seq.fill(10)(50.0)
    val batchEvents = graft.functions.Kernels.cusum(vals.toArray, 5.0, 10, 0.0)
    val mem = MemoryStream[In]
    val out = StreamingPanel.streamingCusum(mem.toDS(), threshold = 5.0, warmupPeriod = 10, drift = 0.0)
    val q = out.writeStream.format("memory").queryName("cp2").outputMode("append").start()
    // feed in three micro-batches
    val data = vals.zipWithIndex.map { case (v, i) => In(0L, ts(i), v) }
    data.grouped(10).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
    q.stop()
    val gotTimes = spark.table("cp2").collect().map(_.getAs[java.sql.Timestamp]("eventTime")).toSet
    val wantTimes = batchEvents.zipWithIndex.collect { case (1, i) => ts(i) }.toSet
    assert(gotTimes == wantTimes)
  }

  test("streaming conformal intervals apply the enbpi nearest-rank quantile per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // values with known one-step naive residuals: +1, -2, +3, -4, ...
    val vals = Seq(10.0, 11.0, 9.0, 12.0, 8.0, 13.0, 7.0)
    val mem = MemoryStream[In]
    val out = StreamingPanel.streamingConformalInterval(
      mem.toDS(), alphaLo = 0.0, alphaHi = 1.0, maxResiduals = 100)
    val q = out.writeStream.format("memory").queryName("ci").outputMode("append").start()
    // two micro-batches so state crosses the boundary
    val data = vals.zipWithIndex.map { case (v, i) => In(0L, ts(i), v) }
    data.grouped(4).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val rows = spark.table("ci").orderBy("eventTime").collect()
    // event k (k >= 2) scores against residuals of events 1..k-1:
    // alpha 0/1 are the running min/max residual added to pred
    val resids = vals.sliding(2).map { case Seq(a, b) => b - a }.toVector
    assert(rows.length == vals.length - 2)
    rows.zipWithIndex.foreach { case (r, i) =>
      val k = i + 2 // event index being scored
      val prefix = resids.take(k - 1)
      val pred = vals(k - 1)
      assert(r.getAs[Double]("pred") == pred)
      assert(r.getAs[Double]("lower") == pred + prefix.min, s"row $i lower")
      assert(r.getAs[Double]("upper") == pred + prefix.max, s"row $i upper")
    }
  }

  test("streaming naive forecast converges to the batch snaive forecast") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vals = (0 until 20).map(i => Seq(3.0, 7.0, 11.0)(i % 3))
    val mem = MemoryStream[In]
    val out = StreamingPanel.streamingNaiveForecast(mem.toDS(), fh = 4, sp = 3,
      stepMillis = 60000L)
    val q = out.writeStream.format("memory").queryName("nf").outputMode("append").start()
    val data = vals.zipWithIndex.map { case (v, i) => In(0L, ts(i), v) }
    data.grouped(8).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // latest emission per horizon = the forecast from the full series
    val latest = spark.table("nf").collect()
      .map(r => (r.getAs[Int]("h"), r.getAs[java.sql.Timestamp]("eventTime"), r.getAs[Double]("value")))
      .groupBy(_._1).map { case (h, rows) => h -> rows.maxBy(_._2.getTime)._3 }
    // batch equivalent over the full series
    val p = graft.core.Panel(
      vals.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
        .toDF("entity", "t", "value"), Seq("entity"), Seq("t"), "value")
    val batch = graft.operators.Forecasters.snaive(p, "t", fh = 4, sp = 3, freq = "1i")
      .orderBy("t").collect().map(_.getAs[Double]("value"))
    (1 to 4).foreach { h =>
      assert(latest(h) == batch(h - 1), s"h=$h: ${latest(h)} vs ${batch(h - 1)}")
    }
  }

  test("streaming band join matches the batch banded range join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = (0 until 12).map(i => (i % 2L, ts(i * 2), i.toLong)) // every 2 min
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    lmem.addData(events: _*); rmem.addData(events: _*)
    val out = StreamingPanel.streamBandJoin(
      lmem.toDF.toDF("entity", "lt", "lid"),
      rmem.toDF.toDF("r_entity", "rt", "rid"),
      "entity", "r_entity", "lt", "rt",
      watermark = "30 minutes", bandSeconds = 300L) // 5-minute trailing band
    val q = out.writeStream.format("memory").queryName("bj").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bj").select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.RangeJoin.joinBand(
      events.toDF("entity", "lt", "lid"),
      events.toDF("entity", "rt", "rid"),
      Seq("entity"), "lt", "rt", Seq("rid"), widthSeconds = 300L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == batch, s"stream $got vs batch $batch")
  }

  test("streaming as-of enrichment attaches the latest preceding right value") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingPanel.TaggedIn
    val mem = MemoryStream[TaggedIn]
    val out = StreamingPanel.streamingAsOfEnrich(mem.toDS())
    val q = out.writeStream.format("memory").queryName("ae").outputMode("append").start()
    // batch 1: right@2=20, left@1, left@3; batch 2 (state carries): left@5, right@5=50, left@6
    mem.addData(
      TaggedIn(0L, ts(2), 20.0, isRight = true),
      TaggedIn(0L, ts(1), 1.0, isRight = false),
      TaggedIn(0L, ts(3), 3.0, isRight = false))
    q.processAllAvailable()
    mem.addData(
      TaggedIn(0L, ts(5), 5.0, isRight = false),
      TaggedIn(0L, ts(5), 50.0, isRight = true),
      TaggedIn(0L, ts(6), 6.0, isRight = false))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ae").collect()
      .map(r => r.getAs[Double]("value") -> Option(r.getAs[Any]("asofValue"))).toMap
    assert(got(1.0).isEmpty)          // nothing at or before t=1
    assert(got(3.0) == Some(20.0))    // right@2 carried
    assert(got(5.0) == Some(50.0))    // inclusive tie: right@5 before left@5
    assert(got(6.0) == Some(50.0))    // state persists across the batch
  }

  test("streaming as-of never attaches a FUTURE right value to a late left event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingPanel.TaggedIn
    val mem = MemoryStream[TaggedIn]
    val out = StreamingPanel.streamingAsOfEnrich(mem.toDS())
    val q = out.writeStream.format("memory").queryName("ae2").outputMode("append").start()
    // batch 1 advances the right state to t=10
    mem.addData(
      TaggedIn(0L, ts(2), 20.0, isRight = true),
      TaggedIn(0L, ts(10), 100.0, isRight = true))
    q.processAllAvailable()
    // batch 2: an out-of-order left event at t=5 — its backward match
    // is right@2 (20.0), NOT the newer right@10
    mem.addData(
      TaggedIn(0L, ts(5), 5.0, isRight = false),
      TaggedIn(0L, ts(11), 11.0, isRight = false))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ae2").collect()
      .map(r => r.getAs[Double]("value") -> Option(r.getAs[Any]("asofValue"))).toMap
    assert(got(5.0) == Some(20.0))    // bounded history serves the late event
    assert(got(11.0) == Some(100.0))  // in-order event gets the latest
  }

  test("streaming session windows match the batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // user 0: bursts at minutes 0-2 and 40-41 (gap 38min > 30min)
    val times = Seq(0, 1, 2, 40, 41)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    mem.addData(times.map(m => (0L, ts(m))): _*)
    val out = StreamingPanel.streamingSessionStats(
      mem.toDF.toDF("entity", "event_time"), "entity", "event_time",
      watermark = "1 minute", gap = "30 minutes")
    val q = out.writeStream.format("memory").queryName("ss").outputMode("append").start()
    q.processAllAvailable()
    // a far-future event advances the watermark past both sessions,
    // forcing append-mode to emit them closed
    mem.addData((0L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss").collect().map(_.getAs[Long]("n_events")).sorted.toSeq
    val batch = graft.operators.Sessionize.sessionStats(
      times.map(m => (0L, ts(m))).toDF("entity", "ts"),
      Seq("entity"), "ts", gapSeconds = 1800L)
      .collect().map(_.getAs[Long]("n_events")).sorted.toSeq
    assert(got == batch, s"stream $got vs batch $batch") // Seq(2, 3)
  }

  test("streaming exact dedup keeps the first copy per content hash") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF.toDF("doc_id", "event_time", "text")
    val out = StreamingPanel.streamingExactDedup(stream, "text", "event_time", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dd").outputMode("append").start()
    // batch 1: two distinct texts + one dup; batch 2: a cross-batch dup + one new
    mem.addData((1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"), (3L, ts(2), "alpha beta"))
    q.processAllAvailable()
    mem.addData((4L, ts(3), "gamma"), (5L, ts(4), "delta"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dd").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L), s"kept $kept")
  }

  test("streaming URL dedup keeps the first arrival per canonical URL") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF.toDF("doc_id", "event_time", "url")
    val out = StreamingPanel.streamingUrlDedup(stream, "url", "event_time", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ud").outputMode("append").start()
    // three spellings of one canonical URL + one distinct; then a
    // cross-batch variant dup + one new
    mem.addData(
      (1L, ts(0), "http://example.com/x?id=1"),
      (2L, ts(1), "HTTP://Example.com/x?id=1&utm_source=a#f"),
      (3L, ts(2), "http://other.com/y"))
    q.processAllAvailable()
    mem.addData(
      (4L, ts(3), "http://www.example.com:80/x?id=1"),
      (5L, ts(4), "https://example.com/z"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("ud").select("doc_id", "canonical_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 3L, 5L), s"kept $kept")
    // the canonical key matches the batch operator's on the same rows
    assert(kept(1L) == "http://example.com/x?id=1")
  }

  test("streaming media sniff + PCM stats match batch (stateless projections)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    // real payloads: an encoded PNG, a WAV, and junk
    val png = MediaCodec.encodeSolid("png", 6, 2, 10, 20, 30)
    val wavSamples = Seq(500, -500, 250)
    val rows = Seq((1L, png), (2L, MediaTestFixtures.pcmWav(wavSamples)),
      (3L, "junk".getBytes("UTF-8")))

    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(rows: _*)
    val stream = mem.toDF.toDF("id", "payload")
    val transform = (df: org.apache.spark.sql.DataFrame) =>
      Multimodal.wavSampleStats(Multimodal.sniffMediaMeta(df, "payload"), "payload")
        .select(col("id"), col("media_meta.media_type").as("mt"),
          col("media_meta.width").as("w"), col("wav_stats.mean_amp").as("ma"))
    val q = transform(stream).writeStream.format("memory").queryName("ms")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ms").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))).toSet
    val want = transform(rows.toDF("id", "payload")).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == want && got.map(_._2) == Set("image/png", "audio/wav",
      "application/octet-stream"))
  }

  test("streaming BPE encode matches batch token counts (stateless merge chain)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.TextAnalysis
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n")
    val rows = Seq((1L, "the thin then"), (2L, "intake"), (3L, ""))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val enc = (df: org.apache.spark.sql.DataFrame) =>
      TextAnalysis.bpeEncode(df, "text", merges).select("id", "bpe_n_tokens")
    val q = enc(mem.toDF.toDF("id", "text")).writeStream.format("memory")
      .queryName("bpe").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bpe").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = enc(rows.toDF("id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the"=1, space, "thin"=th+in=2, space, "then"=the+n=2 → 7
    assert(got == want && got(1L) == 7L)
  }

  test("streaming quality gate keeps exactly the docs the batch filter keeps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      1L -> "the cat and the dog sat in the garden of the old house by the sea",
      2L -> "!!! ??? *** $$$ %%%",                  // punctuation soup → low quality
      3L -> "short",                                // too few tokens
      4L -> "the engine reads the table and the filter is pushed to the scan layer")
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPanel.streamingQualityGate(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
      minQuality = 0.2, minTokens = 5, lang = Some("en"))
    val q = out.writeStream.format("memory").queryName("qg").outputMode("append").start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("qg").select("doc_id").collect().map(_.getLong(0)).toSet
    // the SAME expressions run in batch pick the same survivors
    val batchKept = StreamingPanel.streamingQualityGate(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      minQuality = 0.2, minTokens = 5, lang = Some("en"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == batchKept && kept == Set(1L, 4L), s"stream $kept vs batch $batchKept")
  }

  test("streaming quality-model gate scores bit-identically to the batch fit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference corpus: separable good/bad docs to fit on
    val ref = ((0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over a lazy dog in the sunny park today")) ++
      (20 until 40).map(i => (i.toLong, "zz yy xx ww vv uu tt"))).toDF("doc_id", "text")
    val arriving = Seq(
      100L -> "a slow red fox walks past the quiet dog in a warm field today maybe",
      101L -> "qq pp oo nn mm ll kk jj")
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingPanel.streamingQualityModelGate(
      mem.toDF.toDF("doc_id", "text"), ref, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("qmg").outputMode("append").start()
    mem.addData(arriving: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("qmg").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L), s"kept $kept")
    // the stream's score equals the batch-fit model applied directly
    val streamScore = spark.table("qmg").select("score").collect()(0).getDouble(0)
    val (b0, w) = graft.operators.DataSelection.fitQualityModel(ref, "doc_id", "text")
    val direct = arriving.toDF("doc_id", "text").filter($"doc_id" === 100L)
      .select(graft.operators.DataSelection.qualityScoreColumn($"text", b0, w))
      .collect()(0).getDouble(0)
    assert(streamScore == direct)
  }

  test("streaming PII scrub redacts and counts exactly like batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      1L -> "mail me at a.b@x.example.com from host 10.1.2.3",
      2L -> "clean text with no identifiers at all")
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPanel.streamingPiiScrub(mem.toDF.toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("pii").outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("pii")
      .select("doc_id", "text", "n_email", "n_ip")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("mail me at [EMAIL] from host [IP]", 1L, 1L)))
    assert(got(2L) == (("clean text with no identifiers at all", 0L, 0L)))
    // identical expressions in batch produce the identical rows
    val batch = StreamingPanel.streamingPiiScrub(docs.toDF("doc_id", "text"), "text")
      .select("doc_id", "text", "n_email", "n_ip")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(batch == got)
  }

  test("streaming decontamination gate agrees with the batch scores") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evalDocs = Seq(100L -> "alpha beta gamma delta epsilon zeta eta").toDF("doc_id", "text")
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta", // contaminated
      2L -> "one two three four five six seven",             // clean
      3L -> "tiny")                                          // < n words → kept
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPanel.streamingDecontaminate(
      mem.toDF.toDF("doc_id", "text"), evalDocs, "doc_id", "text", n = 5, threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("dc").outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dc").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"kept $kept")
    // batch operator marks the same doc as contaminated at the same threshold
    val batch = graft.operators.Dedup.decontaminationScores(
      docs.toDF("doc_id", "text"), evalDocs, "doc_id", "text", n = 5, threshold = 0.5)
      .filter(!col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batch == kept, s"batch $batch vs stream $kept")
  }

  test("streaming temperature mixture keeps the batch operator's exact sample") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsSeq = ((0 until 90).map(i => (i.toLong, "A", Seq.fill(10)("w").mkString(" "))) ++
      (90 until 100).map(i => (i.toLong, "B", Seq.fill(10)("w").mkString(" "))))
    val ref = docsSeq.toDF("doc_id", "source", "text")
    val batch = graft.operators.Sampling
      .temperatureMixture(ref, "doc_id", "source", "text", 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[(Long, String, String)]
    val out = StreamingPanel.streamingTemperatureMixture(
      mem.toDF.toDF("doc_id", "source", "text"), ref, "doc_id", "source", "text", 500L)
    val q = out.writeStream.format("memory").queryName("tm").outputMode("append").start()
    mem.addData(docsSeq: _*)
    // an unseen source must be dropped, not silently admitted
    mem.addData((1000L, "C", "x y z"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("tm").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == batch, s"stream $kept vs batch $batch")
  }

  test("streaming LM bucket gate scores and labels like the batch buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docsSeq = (0 until 30).map { i =>
      val t =
        if (i < 20) s"the quick brown fox number $i jumps over the lazy dog and runs on"
        else s"zqxv jkwp $i bfgt mzzd qqpl xkcv wwrt zzvb nmqp"
      (i.toLong, t)
    }
    val ref = docsSeq.toDF("doc_id", "text")
    val batch = graft.operators.DataSelection.perplexityBuckets(ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(4)))).toMap
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPanel.streamingLmBucketGate(mem.toDF.toDF("doc_id", "text"),
      ref, "doc_id", "text", keep = Seq("head", "middle", "tail"))
    val q = out.writeStream.format("memory").queryName("lmg").outputMode("append").start()
    mem.addData(docsSeq: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("lmg").select("doc_id", "cross_entropy", "bucket_label")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got.size == 30)
    // rd6 scores are identical (same tokenization expressions, same
    // smoothed model; rd6 absorbs the fold-order drift)
    got.foreach { case (id, (ce, _)) => assert(ce == batch(id)._1, s"doc $id score") }
    // labels agree wherever the score is unique (equal scores at a
    // cutoff all threshold into the earlier bucket; batch splits ties
    // by rank — the documented boundary semantics)
    val multiplicity = batch.values.groupBy(_._1).map { case (k, v) => k -> v.size }
    got.foreach { case (id, (ce, lbl)) =>
      if (multiplicity(ce) == 1) assert(lbl == batch(id)._2, s"doc $id label")
    }
    // the noise docs land in tail; the default gate would drop them
    assert((20 until 30).forall(i => got(i.toLong)._2 == "tail"))
  }

  test("streaming bloom decontamination gate never admits what exact drops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evalDocs = Seq(100L -> "alpha beta gamma delta epsilon zeta eta").toDF("doc_id", "text")
    val docsSeq = (0 until 40).map { i =>
      // clean docs carry 12 distinct shingles so ONE bloom false
      // positive (frac 1/12) cannot cross the 0.5 threshold — the
      // tight-fpp equality assertion is then robust, not lucky
      val t =
        if (i % 4 == 0) "alpha beta gamma delta epsilon zeta eta theta" // contaminated
        else (0 until 16).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, t)
    }
    val exactKept = StreamingPanel.streamingDecontaminate(
      docsSeq.toDF("doc_id", "text"), evalDocs, "doc_id", "text", n = 5, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (fpp <- Seq(0.5, 0.01)) {
      val mem = MemoryStream[(Long, String)]
      val out = StreamingPanel.streamingBloomDecontaminate(
        mem.toDF.toDF("doc_id", "text"), evalDocs, "doc_id", "text",
        n = 5, threshold = 0.5, fpp = fpp)
      val qn = s"bdc${(fpp * 100).toInt}"
      val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
      mem.addData(docsSeq: _*)
      q.processAllAvailable(); q.stop()
      val kept = spark.table(qn).select("doc_id").collect().map(_.getLong(0)).toSet
      // no false negatives: the bloom gate's kept set never exceeds exact's
      assert(kept.subsetOf(exactKept), s"fpp=$fpp kept $kept")
      if (fpp == 0.01) assert(kept == exactKept, s"tight fpp should equal exact")
    }
  }

  test("streaming SemDedup gate drops reference near-dups, assigns like batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference: two orthogonal directions
    val ref = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val arriving = Seq(
      (1L, Array(2f, 0f, 0f, 0f)),   // parallel to ref 100 → dup
      (2L, Array(0f, 0f, 1f, 0f)),   // orthogonal to both → kept
      (3L, Array(0f, 3f, 0f, 0f)))   // parallel to ref 101 → dup
    val mem = MemoryStream[(Long, Array[Float])]
    val out = StreamingPanel.streamingSemDedupGate(
      mem.toDF.toDF("vec_id", "embedding"), ref, "vec_id", "embedding",
      nClusters = 2, tau = 0.9)
    val q = out.writeStream.format("memory").queryName("sdg").outputMode("append").start()
    mem.addData(arriving: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("sdg").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"kept $kept")
    // the stream's cluster assignment equals the batch operator's on
    // the same centroids (shared clusterAssignCol definition)
    val centroids = graft.operators.Dedup.sampleCentroids(ref, "vec_id", "embedding", 2)
    val batchClusters = arriving.toDF("vec_id", "embedding")
      .withColumn("cluster",
        graft.operators.Dedup.clusterAssignCol(col("embedding"), centroids))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamClusters = spark.table("sdg")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    streamClusters.foreach { case (id, c) => assert(batchClusters(id) == c) }
  }

  test("streaming MJPEG frame decode matches batch frame-for-frame") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{MediaCodec, MediaFixtures, Multimodal}
    // withVideoFrames is a stateless per-row kernel — it runs on an
    // unbounded stream unchanged (one definition, two runtimes)
    val avi = MediaFixtures.aviMjpegKernel(Seq(
      MediaCodec.encodeSolid("png", 4, 4, 9, 8, 7),
      MediaCodec.encodeSolid("bmp", 5, 6, 1, 2, 3),
      MediaCodec.encodeSolid("png", 7, 7, 250, 0, 5)))
    val rows = Seq((1L, avi), (2L, avi))
    val mem = MemoryStream[(Long, Array[Byte])]
    val out = Multimodal.withVideoFrames(
      mem.toDF.toDF("doc_id", "payload"), "payload", n = 2)
      .select($"doc_id", $"frame_idx", $"frame_stats.width", $"frame_stats.mean_r")
    val q = out.writeStream.format("memory").queryName("svf").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("svf").collect().map(_.toSeq).toSet
    val batch = Multimodal.withVideoFrames(rows.toDF("doc_id", "payload"), "payload", n = 2)
      .select($"doc_id", $"frame_idx", $"frame_stats.width", $"frame_stats.mean_r")
      .collect().map(_.toSeq).toSet
    assert(stream == batch && stream.size == 4, s"stream $stream vs batch $batch")
  }

  test("streaming SemDedup gate with an empty reference keeps every row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emptyRef = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val mem = MemoryStream[(Long, Array[Float])]
    val out = StreamingPanel.streamingSemDedupGate(
      mem.toDF.toDF("vec_id", "embedding"), emptyRef, "vec_id", "embedding",
      nClusters = 4, tau = 0.9)
    val q = out.writeStream.format("memory").queryName("sdg0").outputMode("append").start()
    mem.addData(Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))): _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("sdg0").count() == 2)
  }

  test("streaming LSH near-dup candidates match the batch operator's pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      1L -> base,
      2L -> base,                                    // exact dup of 1
      3L -> base.replace("lazy", "sleepy"),          // near-dup of 1
      4L -> "completely different words about spark structured streaming state",
      5L -> "yet another unrelated document mentioning minhash banding buckets",
      6L -> base.replace("today", "tomorrow"))       // near-dup of 1
    val mem = MemoryStream[StreamingPanel.DocIn]
    val out = StreamingPanel.streamingNearDupCandidates(
      mem.toDS(), shingleSize = 3, numHashes = 16, rowsPerBand = 4)
    val q = out.writeStream.format("memory").queryName("nd").outputMode("append").start()
    // split across micro-batches: cross-batch pairs must still surface
    mem.addData(docs.take(3).map { case (id, t) => StreamingPanel.DocIn(id, t) }: _*)
    q.processAllAvailable()
    mem.addData(docs.drop(3).map { case (id, t) => StreamingPanel.DocIn(id, t) }: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("nd").select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = graft.operators.Dedup.minhashSignatures(
      docs.toDF("doc_id", "text"), "doc_id", "text", shingleSize = 3, numHashes = 16)
    val batch = graft.operators.Dedup
      .minhashCandidatePairs(sigs, "doc_id", numHashes = 16, rowsPerBand = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(batch.contains((1L, 2L)), "exact dup must collide")
  }

  test("streaming holiday enrichment matches the batch generator join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-07-04 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-07-05 10:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-12-25 00:00:00")))
    mem.addData(rows: _*)
    val out = StreamingPanel.streamingHolidayEffects(
      mem.toDF.toDF("id", "ts"), "ts", Seq("US", "GB"), 2024 to 2024)
    val q = out.writeStream.format("memory").queryName("hol").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hol").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)), Option(r.getString(3))))
    assert(got.toSeq == Seq(
      (1L, Some("independence_day"), None),
      (2L, None, None),
      (3L, Some("christmas_day"), Some("christmas_day"))))
  }
  test("streaming weighted quantile: single-trigger replay is bitwise the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingPanel.WeightedIn
    val rnd = new scala.util.Random(5)
    val data = (0 until 400).flatMap(i => Seq(
      WeightedIn(0L, ts(i), rnd.nextGaussian() * 10 + 50, 0.5 + rnd.nextDouble()),
      WeightedIn(1L, ts(i), rnd.nextDouble() * 100, 1.0)))
    // batch twin: same eventTime order, add-all-then-query-once
    def batchQ(entity: Long): Double = {
      val sk = new graft.functions.WeightedQuantileSketch(2000, 8192)
      data.filter(_.entity == entity).sortBy(_.eventTime.getTime)
        .foreach(r => sk.add(r.value, r.weight))
      sk.quantile(0.9).doubleValue
    }
    val mem = MemoryStream[WeightedIn]
    mem.addData(data: _*)
    val out = StreamingPanel.streamingWeightedQuantile(mem.toDS(), alpha = 0.9)
    val q = out.writeStream.format("memory").queryName("wq").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wq").collect()
      .map(r => r.getAs[Long]("entity") -> r.getAs[Double]("quantile")).toMap
    assert(got.keySet == Set(0L, 1L))
    for (e <- Seq(0L, 1L))
      assert(got(e) == batchQ(e), s"entity $e: ${got(e)} vs batch ${batchQ(e)}")
  }

  test("streaming weighted quantile: multi-trigger state stays within the 1/δ rank bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingPanel.WeightedIn
    val rnd = new scala.util.Random(9)
    val vw = (0 until 30000).map(i =>
      (rnd.nextGaussian(), 0.5 + rnd.nextDouble(), ts(i)))
    val data = vw.map { case (v, w, t) => WeightedIn(7L, t, v, w) }
    val mem = MemoryStream[WeightedIn]
    val out = StreamingPanel.streamingWeightedQuantile(mem.toDS(), alpha = 0.75)
    val q = out.writeStream.format("memory").queryName("wq2").outputMode("append").start()
    data.grouped(10000).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val rows = spark.table("wq2").orderBy("eventTime").collect()
    assert(rows.length == 3, "one emission per entity per trigger")
    // per-trigger state stays bounded at ~2δ centroids
    rows.foreach(r => assert(r.getAs[Long]("centroids") <= 2 * 2000 + 1))
    // final answer: exact weighted CDF rank of the sketch value within
    // a small multiple of 1/δ of α (state roundtrips are sketch-legal
    // centroid merges — same bound as one big fold)
    val sAll = vw.map(t => (t._1, t._2)).sortBy(_._1)
    val cum = sAll.scanLeft(0.0)(_ + _._2).tail
    val sv = rows.last.getAs[Double]("quantile")
    val i = sAll.indexWhere(_._1 > sv)
    val rank = (if (i < 0) cum.last else if (i == 0) 0.0 else cum(i - 1)) / cum.last
    assert(math.abs(rank - 0.75) <= 10.0 / 2000,
      s"realized rank $rank drifted beyond 10/δ from 0.75")
  }
}

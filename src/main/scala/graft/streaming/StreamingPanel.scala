package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (beyond the reference's batch-only
  * surface — SURVEY.md §2.0 notes streaming is absent upstream; this
  * module makes the same per-entity operators run incrementally).
  *
  * Design: the SQL-composed feature extractors are plain aggregate
  * `Column`s, so they drop unchanged into
  * `stream.withWatermark(...).groupBy(entity, window(...)).agg(...)` —
  * one code path for batch and stream. Stateful sequential operators
  * (the CUSUM changepoint filter) use `flatMapGroupsWithState` with a
  * bounded per-entity state (warmup buffer ≤ warmupPeriod values), the
  * Spark-native equivalent of the reference's Rust state machine
  * (src/changepoint_detection/cusum.rs:33-93).
  */
object StreamingPanel {

  /** Watermarked sliding-window feature aggregation. `aggs` are any
    * aggregate Columns (e.g. Features.absoluteEnergy(col)) — identical
    * semantics batch or stream. */
  def windowedFeatures(stream: DataFrame, entityCol: String, timeCol: String,
                       watermark: String, windowDuration: String, slideDuration: String,
                       aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), window(col(timeCol), windowDuration, slideDuration))
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup: keep the FIRST document per content hash,
    * drop later copies. State = one row per distinct hash inside the
    * watermark horizon (`dropDuplicatesWithinWatermark`), so memory is
    * bounded by distinct-docs-per-horizon, not stream length — the
    * incremental form of [[graft.operators.Dedup.exactDedup]] for
    * ingest-time pipelines. */
  def streamingExactDedup(stream: DataFrame, textCol: String, timeCol: String,
                          watermark: String): DataFrame =
    stream
      .withColumn("text_hash", md5(col(textCol).cast("binary")))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming URL dedup — the ingest-time form of
    * [[graft.operators.Dedup.urlDedup]]: canonicalize each arriving
    * URL with the SAME per-row chain as batch
    * ([[graft.operators.TextAnalysis.canonicalUrl]] — one definition,
    * two runtimes), keep the first arrival per canonical form within
    * the watermark. State is one 16-byte md5 key per distinct
    * canonical URL inside the watermark horizon — the exact-dedup
    * bound, independent of stream length. */
  def streamingUrlDedup(stream: DataFrame, urlCol: String, timeCol: String,
                        watermark: String): DataFrame =
    stream
      .withColumn("canonical_url",
        graft.operators.TextAnalysis.canonicalUrl(col(urlCol)))
      .withColumn("url_hash", md5(col("canonical_url").cast("binary")))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("url_hash")

  /** One emitted forecast row: entity, horizon step, future event
    * time, predicted value. */
  final case class ForecastRow(entity: Long, h: Int,
                               eventTime: java.sql.Timestamp, value: Double)

  /** Online (seasonal-)naive forecasting: per entity, keep the last
    * `sp` observed values + the latest cutoff (bounded state); every
    * micro-batch that touches an entity re-emits its fh-step forecast
    * from the fresh state — the incremental form of
    * [[graft.operators.Forecasters.snaive]] (sp = 1 gives plain
    * naive). State is O(sp) doubles per entity: checkpointable and
    * independent of stream length. */
  /** Streaming banded range join — the incremental form of
    * [[graft.operators.RangeJoin.joinBand]]: pair each left event
    * with same-entity right events in its trailing `bandSeconds`
    * window, as a native watermarked stream-stream interval join
    * (state expires once the watermark passes the band — bounded by
    * band width × arrival rate, not stream length). The two sides are
    * alias-qualified, so shared column names (the entity key, or even
    * the time column) resolve; duplicated names simply appear twice in
    * the output. */
  def streamBandJoin(left: DataFrame, right: DataFrame,
                     leftEntity: String, rightEntity: String,
                     leftTime: String, rightTime: String,
                     watermark: String, bandSeconds: Long): DataFrame = {
    // a string expr("entity = entity AND ...") cannot name the sides —
    // with equal column names analysis fails ambiguous; qualified refs
    // over explicit aliases are the only form that always resolves
    val l = left.withWatermark(leftTime, watermark).alias("__bj_l")
    val r = right.withWatermark(rightTime, watermark).alias("__bj_r")
    l.join(r,
      col(s"__bj_l.$leftEntity") === col(s"__bj_r.$rightEntity") &&
        col(s"__bj_r.$rightTime") >=
          col(s"__bj_l.$leftTime") - expr(s"INTERVAL $bandSeconds seconds") &&
        col(s"__bj_r.$rightTime") < col(s"__bj_l.$leftTime"))
  }

  /** Streaming sessionization — the incremental form of
    * [[graft.operators.Sessionize.sessionStats]] using Spark's native
    * `session_window` (gap-merged windows, state expires at the
    * watermark). */
  def streamingSessionStats(stream: DataFrame, entityCol: String, timeCol: String,
                            watermark: String, gap: String): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(col(entityCol), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"))

  /** One as-of-enriched event: the left event plus the latest
    * right-side value at or before it (null value + MinValue time when
    * nothing preceded). */
  final case class EnrichedEvent(entity: Long, eventTime: java.sql.Timestamp,
                                 value: Double, asofValue: Option[Double],
                                 asofTime: Long)

  /** Mark a row as left (event to enrich) or right (reference value). */
  final case class TaggedIn(entity: Long, eventTime: java.sql.Timestamp,
                            value: Double, isRight: Boolean)

  /** Bounded as-of state: the last `maxHistory` right (time, value)
    * pairs, time-ascending. */
  final case class AsOfState(times: Seq[Long], vals: Seq[Double])

  /** Streaming backward as-of enrichment — the incremental form of
    * [[graft.operators.AsOfJoin.asofBackward]]: per entity, keep the
    * last `maxHistory` right-side (time, value) pairs — O(maxHistory)
    * state — and stamp each left event with the latest right value at
    * or before ITS event time (never a future one), so out-of-order
    * left events arriving in a later micro-batch still get backward
    * as-of semantics. A left event older than the oldest retained
    * right entry gets null (`asofTime = Long.MinValue`): the true
    * match was evicted, and a null beats silently attaching a wrong
    * value. Within a micro-batch rows are processed in event-time
    * order with right rows before left on ties (the inclusive ≤ match
    * of the batch operator). */
  def streamingAsOfEnrich(events: Dataset[TaggedIn],
                          maxHistory: Int = 32): Dataset[EnrichedEvent] = {
    implicit val stateEnc: Encoder[AsOfState] = Encoders.product[AsOfState]
    implicit val outEnc: Encoder[EnrichedEvent] = Encoders.product[EnrichedEvent]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[AsOfState, EnrichedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[TaggedIn], state: GroupState[AsOfState]) =>
          var s = state.getOption.getOrElse(AsOfState(Vector.empty, Vector.empty))
          var times = s.times.toVector
          var vals = s.vals.toVector
          val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedEvent]
          // right rows first on equal timestamps → inclusive match
          rows.toSeq.sortBy(r => (r.eventTime.getTime, !r.isRight)).foreach { r =>
            val t = r.eventTime.getTime
            if (r.isRight) {
              // insert in time order (out-of-order right rows land
              // mid-history), then trim to the newest maxHistory
              val i = times.lastIndexWhere(_ <= t) + 1
              times = (times.take(i) :+ t) ++ times.drop(i)
              vals = (vals.take(i) :+ r.value) ++ vals.drop(i)
              if (times.length > maxHistory) { times = times.tail; vals = vals.tail }
            } else {
              // i < 0 covers both "no right row yet" and "the true
              // match aged out of maxHistory" — either way no retained
              // value is <= t, so the enrichment is honestly absent
              val i = times.lastIndexWhere(_ <= t)
              out += EnrichedEvent(entity, r.eventTime, r.value,
                if (i >= 0) Some(vals(i)) else None,
                if (i >= 0) times(i) else Long.MinValue)
            }
          }
          state.update(AsOfState(times, vals))
          out.iterator
      }
  }

  /** Bounded per-entity forecast state: last ≤ sp values + cutoff. */
  final case class NaiveState(tail: Seq[Double], cutoff: Long)

  def streamingNaiveForecast(events: Dataset[In], fh: Int, sp: Int,
                             stepMillis: Long): Dataset[ForecastRow] = {
    implicit val stateEnc: Encoder[NaiveState] = Encoders.product[NaiveState]
    implicit val outEnc: Encoder[ForecastRow] = Encoders.product[ForecastRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[NaiveState, ForecastRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[In], state: GroupState[NaiveState]) =>
          var s = state.getOption.getOrElse(NaiveState(Vector.empty, Long.MinValue))
          rows.toSeq.sortBy(_.eventTime.getTime).foreach { r =>
            if (r.eventTime.getTime > s.cutoff) {
              s = NaiveState((s.tail :+ r.value).takeRight(sp), r.eventTime.getTime)
            }
          }
          state.update(s)
          if (s.tail.isEmpty) Iterator.empty
          else (1 to fh).iterator.map { h =>
            // oldest-first tail of the last sp values, cycled —
            // identical to batch snaive's element_at(tail,
            // ((h−1) mod size)+1) (snaive.py:9; short series cycle
            // whatever tail exists)
            val v = s.tail((h - 1) % s.tail.size)
            ForecastRow(entity, h,
              new java.sql.Timestamp(s.cutoff + h * stepMillis), v)
          }
      }
  }

  /** Per-entity CUSUM state, bounded: warmup buffer never exceeds
    * `warmupPeriod` elements. */
  final case class CusumState(t: Int, obs: Seq[Double], mu: Double, sigma: Double,
                              sPos: Double, sNeg: Double)

  final case class CusumEvent(entity: Long, eventTime: java.sql.Timestamp, value: Double)

  final case class In(entity: Long, eventTime: java.sql.Timestamp, value: Double)

  /** Online CUSUM changepoints — incremental form of Kernels.cusum
    * (same warmup-estimate / standardized-accumulate / fire-and-reset
    * machine), emitting one row per detected changepoint. Input rows
    * are processed in event-time order within each micro-batch; state
    * carries across batches. */
  def streamingCusum(events: Dataset[In], threshold: Double, warmupPeriod: Int,
                     drift: Double): Dataset[CusumEvent] = {
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    implicit val outEnc: Encoder[CusumEvent] = Encoders.product[CusumEvent]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[CusumState, CusumEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[In], state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(CusumState(0, Vector.empty, 0.0, 0.0, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumEvent]
          rows.toSeq.sortBy(_.eventTime.getTime).foreach { r =>
            if (s.t < warmupPeriod) {
              s = s.copy(t = s.t + 1, obs = s.obs :+ r.value)
            } else {
              var (mu, sigma, t) = (s.mu, s.sigma, s.t)
              if (t == warmupPeriod) {
                mu = s.obs.sum / s.obs.length
                sigma = math.sqrt(s.obs.map(x => (x - mu) * (x - mu)).sum / s.obs.length)
                t += 1
              }
              val z = (r.value - mu) / sigma
              // Rust-max semantics like Kernels.cusum: a NaN sum (z =
              // 0/0 on a zero-sigma warmup) resets to 0 instead of
              // poisoning the unbounded state forever — a later level
              // shift gives z = ±Inf and still fires
              val sp = s.sPos + z - drift
              val sn = s.sNeg + z + drift
              val sPos = if (sp.isNaN) 0.0 else math.max(sp, 0.0)
              val sNeg = if (sn.isNaN) 0.0 else math.min(sn, 0.0)
              if (sPos > threshold || sNeg < -threshold) {
                out += CusumEvent(entity, r.eventTime, r.value)
                s = CusumState(0, Vector.empty, 0.0, 0.0, 0.0, 0.0)
              } else {
                s = CusumState(t, s.obs, mu, sigma, sPos, sNeg)
              }
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** One weighted streaming observation. */
  final case class WeightedIn(entity: Long, eventTime: java.sql.Timestamp,
                              value: Double, weight: Double)

  /** Bounded per-entity weighted-quantile state: the sketch's
    * compressed (mean, weight) centroids — ≤ ~2δ pairs, independent
    * of stream length. */
  final case class WQState(means: Seq[Double], weights: Seq[Double])

  final case class QuantileRow(entity: Long, eventTime: java.sql.Timestamp,
                               centroids: Long, quantile: Double)

  /** Streaming weighted-quantile renewal — the incremental twin of the
    * batch GBT quantile objective's weighted renewal
    * ([[graft.functions.WeightedQuantileSketch]], TreeBoost
    * `quantileExact = false` + weights): per entity, fold each
    * micro-batch's (value, weight) rows (eventTime order) into the
    * bounded merging-histogram sketch held in state, and emit ONE row
    * per entity per trigger with the post-batch α-quantile. Querying
    * once per trigger (not per event) keeps the add-then-query-once
    * sequence identical to a batch fold over the same rows — a
    * single-trigger replay is therefore BITWISE the batch sketch
    * (StreamingSpec pins it); across triggers each state roundtrip
    * re-folds already-compressed centroids and compresses again, so
    * the rank-error bound is a small multiple of 1/δ that grows with
    * the number of triggers (StreamingSpec budgets 10/δ for its
    * multi-trigger replay) — do NOT rely on a strict 1/δ guarantee
    * for long streams; raise δ instead. State is ≤ ~2δ (mean, weight)
    * pairs per entity,
    * independent of stream length — the bounded-memory property that
    * makes the weighted renewal streamable at all (the exact renewal
    * buffers every pair). Non-positive weights and NaN values are
    * skipped, matching the batch aggregator's contract. */
  def streamingWeightedQuantile(events: Dataset[WeightedIn], alpha: Double,
                                delta: Int = 2000): Dataset[QuantileRow] = {
    require(alpha > 0.0 && alpha < 1.0,
      s"streaming weighted quantile needs alpha in (0,1), got $alpha")
    implicit val stateEnc: Encoder[WQState] = Encoders.product[WQState]
    implicit val outEnc: Encoder[QuantileRow] = Encoders.product[QuantileRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[WQState, QuantileRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[WeightedIn], state: GroupState[WQState]) =>
          val sk = new graft.functions.WeightedQuantileSketch(delta, 8192)
          state.getOption.foreach { s =>
            var i = 0
            while (i < s.means.length) { sk.add(s.means(i), s.weights(i)); i += 1 }
          }
          val sorted = rows.toSeq.sortBy(_.eventTime.getTime)
          sorted.foreach(r => sk.add(r.value, r.weight))
          val q = sk.quantile(alpha)
          // persist the compressed centroid set (quantile() compressed
          // above when nc > 0; an under-buffer group compresses here —
          // the stored state is always the bounded set)
          sk.compress()
          val pairs = (0 until sk.centroidCount)
          state.update(WQState(
            pairs.map(sk.centroidMean), pairs.map(sk.centroidWeight)))
          if (sorted.isEmpty || q == null) Iterator.empty
          else Iterator(QuantileRow(entity, sorted.last.eventTime,
            sk.centroidCount.toLong, q.doubleValue))
      }
  }

  /** Bounded per-entity conformal state: last ≤ maxResiduals one-step
    * naive residuals, the previous observed value, and the cutoff. */
  final case class ConformalState(resids: Seq[Double], lastValue: Double,
                                  hasLast: Boolean, cutoff: Long)

  final case class IntervalRow(entity: Long, eventTime: java.sql.Timestamp,
                               actual: Double, pred: Double,
                               lower: Double, upper: Double)

  /** Online conformal prediction intervals — the incremental form of
    * [[graft.operators.Conformal.enbpi]] (conformal.py:6-38) for the
    * one-step naive forecaster: per entity, keep a sliding window of
    * the last `maxResiduals` out-of-sample residuals (actual − naive
    * pred); each arriving event is first scored against the CURRENT
    * residual distribution (pred ± the alphaLo/alphaHi nearest-rank
    * quantiles — the same round-half-away rank the batch operator
    * uses), then its own residual joins the window. State is
    * O(maxResiduals) doubles per entity, independent of stream
    * length; events at or before the cutoff are dropped (in-order
    * contract, like the naive forecaster). Rows emit once ≥ 1
    * residual is banked. */
  def streamingConformalInterval(events: Dataset[In], alphaLo: Double,
                                 alphaHi: Double,
                                 maxResiduals: Int): Dataset[IntervalRow] = {
    implicit val stateEnc: Encoder[ConformalState] = Encoders.product[ConformalState]
    implicit val outEnc: Encoder[IntervalRow] = Encoders.product[IntervalRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[ConformalState, IntervalRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[In], state: GroupState[ConformalState]) =>
          var s = state.getOption.getOrElse(
            ConformalState(Vector.empty, 0.0, hasLast = false, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[IntervalRow]
          rows.toSeq.sortBy(_.eventTime.getTime).foreach { r =>
            if (r.eventTime.getTime > s.cutoff) {
              if (s.hasLast) {
                val pred = s.lastValue
                if (s.resids.nonEmpty) {
                  val sorted = s.resids.sorted
                  def q(a: Double): Double = // enbpi nearest-rank (Conformal.scala:33-40)
                    sorted(math.floor(a * (sorted.size - 1) + 0.5).toInt)
                  out += IntervalRow(entity, r.eventTime, r.value, pred,
                    pred + q(alphaLo), pred + q(alphaHi))
                }
                s = s.copy(resids = (s.resids :+ (r.value - pred))
                  .takeRight(maxResiduals))
              }
              s = s.copy(lastValue = r.value, hasLast = true,
                cutoff = r.eventTime.getTime)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** One streaming document. */
  /** Streaming document quality gate: score each arriving doc with the
    * SAME batch column expressions (token count, quality score,
    * language id, trigram-free heuristics are all pure per-row algebra
    * — no state, no watermark needed) and keep those passing the
    * thresholds. The filter is identical to running
    * [[graft.operators.TextAnalysis.analyze]] + filter in batch: one
    * definition, two runtimes. */
  def streamingQualityGate(docs: DataFrame, idCol: String, textCol: String,
                           minQuality: Double = 0.3, minTokens: Int = 5,
                           lang: Option[String] = None): DataFrame = {
    import graft.operators.TextAnalysis
    val scored = docs.withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
    val base = scored.filter(col("quality") >= minQuality &&
      col("n_tokens") >= minTokens)
    lang.fold(base)(l => base.filter(col("lang_pred") === l))
  }

  /** Streaming form of the trained quality filter: fit the linear
    * scorer ONCE on a static reference corpus
    * ([[graft.operators.DataSelection.fitQualityModel]] — one batch
    * pass), then gate the stream with the coefficients inlined as
    * literals. Train-batch / serve-stream: the scoring projection is
    * stateless per-row algebra, so the gate runs on an unbounded
    * stream with no state or watermark, exactly like the batch
    * scorer's zero-shuffle pass. */
  def streamingQualityModelGate(docs: DataFrame, referenceCorpus: DataFrame,
                                idCol: String, textCol: String,
                                threshold: Double = 0.5,
                                ridge: Double = 1e-3): DataFrame = {
    import graft.operators.DataSelection
    val (b0, w) = DataSelection.fitQualityModel(referenceCorpus, idCol, textCol, ridge)
    docs.withColumn("score", DataSelection.qualityScoreColumn(col(textCol), b0, w))
      .filter(col("score") >= threshold)
  }

  /** Streaming holiday enrichment: the rule-generated per-country
    * tables ([[graft.operators.HolidayCalendar]]) broadcast-joined
    * onto arriving rows — stateless, no watermark. Unlike the batch
    * operator the year span cannot come from the (unbounded) data, so
    * the caller supplies it; rows outside the span simply carry NULL
    * labels, like any non-holiday date. */
  def streamingHolidayEffects(stream: DataFrame, timeCol: String,
                              countryCodes: Seq[String],
                              years: Range): DataFrame = {
    import graft.operators.HolidayCalendar
    val spark = stream.sparkSession
    import spark.implicits._
    countryCodes.foldLeft(stream) { (d, code) =>
      val tbl = HolidayCalendar.holidays(code, years)
        .map { case (dt, l) => (java.sql.Date.valueOf(dt), l) }
        .toDF("__hdate", s"holiday__$code")
      d.join(broadcast(tbl), to_date(d(timeCol)) === tbl("__hdate"), "left")
        .drop("__hdate")
    }
  }

  /** Streaming PII scrub: redact every PII match and attach the
    * per-type counts — the batch [[graft.operators.TextAnalysis]]
    * pattern set run unchanged on the stream (stateless per-row
    * regexps; one definition, two runtimes). Counts are computed on
    * the raw text BEFORE redaction, like the batch query. */
  def streamingPiiScrub(docs: DataFrame, textCol: String): DataFrame = {
    import graft.operators.TextAnalysis
    docs
      .select(col("*") +: TextAnalysis.piiCounts(col(textCol)): _*)
      .withColumn(textCol, TextAnalysis.piiRedact(col(textCol)))
  }

  /** Streaming decontamination gate: drop arriving docs whose distinct
    * word n-gram overlap with a STATIC eval corpus reaches the
    * threshold — the ingest-time form of
    * [[graft.operators.Dedup.decontaminationScores]]. The eval corpus
    * reduces to its distinct n-gram set ONCE at plan time and ships as
    * a literal array (a benchmark suite is small — the same reasoning
    * as the batch operator's broadcast side), so the gate is a pure
    * stateless per-row expression: array_intersect against the doc's
    * own distinct shingles. No state, no watermark, unbounded stream. */
  def streamingDecontaminate(docs: DataFrame, evalDocs: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 5, threshold: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val evalGrams = Dedup.shingleRows(evalDocs, idCol, textCol, n)
      .select("__sh").distinct().collect().map(_.getString(0)).sorted
    val g = Dedup.shingles(col(textCol), n)
    val frac = when(size(g) > 0,
      size(array_intersect(g, typedlit(evalGrams.toSeq))).cast("double") /
        size(g).cast("double")).otherwise(0.0)
    docs.withColumn("contamination_frac", frac)
      .filter(col("contamination_frac") < threshold)
  }

  /** Streaming decontamination gate for eval suites too large to ship
    * as a literal n-gram array ([[streamingDecontaminate]]'s regime
    * bound): the eval set reduces ONCE to a Bloom filter (~10
    * bits/key — a 1B-n-gram suite is ~1.2 GB of bits where its
    * distinct-set literal cannot compile, let alone broadcast as a
    * plan constant), and each arriving doc counts might-contain hits
    * over its own distinct shingles. Bloom filters have no false
    * negatives, so every doc the exact gate drops, this gate drops
    * too (the spec asserts the superset property and exactness at
    * tight fpp); false positives only make the gate STRICTER —
    * the safe direction for decontamination. Stateless per-row, no
    * watermark. */
  def streamingBloomDecontaminate(docs: DataFrame, evalDocs: DataFrame,
                                  idCol: String, textCol: String,
                                  n: Int = 5, threshold: Double = 0.5,
                                  fpp: Double = 0.01): DataFrame = {
    import graft.operators.Dedup
    val evalG = Dedup.shingleRows(evalDocs, idCol, textCol, n)
      .select(col("__sh")).distinct()
    val nEval = math.max(1L, evalG.count())
    val bloom = evalG.stat.bloomFilter("__sh", nEval, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val hitFrac = udf { (shingles: Seq[String]) =>
      if (shingles == null || shingles.isEmpty) 0.0
      else {
        val b = bc.value
        var hits = 0
        shingles.foreach(s => if (b.mightContainString(s)) hits += 1)
        hits.toDouble / shingles.length
      }
    }
    docs
      .withColumn("contamination_frac", hitFrac(Dedup.shingles(col(textCol), n)))
      .filter(col("contamination_frac") < threshold)
  }

  /** Streaming temperature-mixture gate: per-source keep rates
    * computed ONCE from a static reference corpus
    * ([[graft.operators.Sampling.temperatureMixture]]'s α = 1/2
    * reweighting) and inlined as a when-chain; each arriving doc
    * decides with the same portable hash draw — stateless,
    * join-stable, reproducible across reruns and engines. Sources
    * unseen in the reference get rate 0 (nothing known about their
    * weight — they'd silently skew the mixture). */
  def streamingTemperatureMixture(docs: DataFrame, referenceCorpus: DataFrame,
                                  idCol: String, srcCol: String,
                                  textCol: String,
                                  tokenBudget: Long): DataFrame = {
    import graft.operators.Sampling
    val rates = Sampling.sourceRates(referenceCorpus, srcCol, textCol, tokenBudget)
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(srcCol) === s, lit(r)).otherwise(acc)
    }
    docs.withColumn("rate", graft.queries.Q.rd6(rate))
      .filter(Sampling.uniformHash(
        concat(col(srcCol), lit(":"), col(idCol).cast("string"))) < col("rate"))
  }

  /** Streaming CCNet LM gate (Wenzek et al. 2020 serving shape): train
    * the char-trigram LM and the head/middle/tail cutoffs ONCE on a
    * static reference corpus (batch passes at plan time —
    * [[graft.operators.DataSelection.perplexityBuckets]] defines each
    * cutoff as its bucket's max cross-entropy), then label every
    * arriving document statelessly. Trigrams come from the SAME column
    * expressions as batch (normalized text + CharNGrams — the two
    * runtimes can never tokenize differently); the model lookup + mean
    * runs as a bounded imperative probe over the broadcast count maps
    * (the SemDedup-gate precedent: a per-row hash probe, not
    * interpreted per-element HOF algebra). Unseen trigrams score with
    * the add-one smoothing the batch model implies — (0+1)/(c2+37),
    * c2 = 0 for unseen contexts — so out-of-corpus text degrades
    * gracefully toward the tail. Docs under 3 normalized chars carry
    * no signal and drop, like the batch scorer. `keep` filters labels
    * (CCNet discards or down-samples the tail). No state, no
    * watermark, unbounded stream; the broadcast is alphabet³-bounded. */
  def streamingLmBucketGate(docs: DataFrame, referenceCorpus: DataFrame,
                            idCol: String, textCol: String,
                            keep: Seq[String] = Seq("head", "middle")): DataFrame = {
    import graft.operators.{DataSelection, TextAnalysis}
    val buckets = DataSelection.perplexityBuckets(referenceCorpus, idCol, textCol)
    val cuts = buckets.groupBy("bucket").agg(max("cross_entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t0 = cuts.getOrElse(0L, Double.NegativeInfinity)
    val t1 = cuts.getOrElse(1L, t0)
    val (triCount, ctxCount) =
      TextAnalysis.trigramModelMaps(referenceCorpus, idCol, textCol)
    val score = TextAnalysis.trigramScoreUdf(docs.sparkSession, triCount, ctxCount)
    val tris = graft.functions.CharNGrams.ngrams(
      TextAnalysis.normalized(col(textCol)), 3)
    docs
      .withColumn("cross_entropy", graft.queries.Q.rd6(score(tris)))
      .filter(col("cross_entropy").isNotNull)
      .withColumn("bucket_label",
        when(col("cross_entropy") <= t0, "head")
          .when(col("cross_entropy") <= t1, "middle")
          .otherwise("tail"))
      .filter(col("bucket_label").isin(keep: _*))
  }

  /** Streaming SemDedup gate: drop arriving embeddings that are
    * semantic duplicates of a STATIC reference corpus — the
    * ingest-time form of [[graft.operators.Dedup.semDedup]]. The
    * reference corpus is reduced ONCE at plan time to (a) the same
    * md5-ordered centroid sample the batch operator uses (shared
    * [[graft.operators.Dedup.clusterAssignAuto]] — the two runtimes
    * can never assign differently) and (b) ≤ `maxPerCluster`
    * md5-rank-capped member vectors per cluster. Both are bounded
    * (nClusters × dim and nClusters × maxPerCluster × dim) and ride
    * in a broadcast, so the gate is stateless per row: assign
    * cluster by literal argmax, scan only that cluster's members for
    * cosine ≥ τ — the genuinely imperative bounded lookup (the
    * KNN-heap precedent), not per-row HOF algebra which Spark would
    * interpret element-wise. No state, no watermark, unbounded
    * stream; at 100 TB the reference reduction is one batch pass. */
  def streamingSemDedupGate(vecs: DataFrame, referenceCorpus: DataFrame,
                            idCol: String, vecCol: String,
                            nClusters: Int, tau: Double,
                            maxPerCluster: Int = 256): DataFrame = {
    import graft.operators.Dedup
    val centroids = Dedup.sampleCentroids(referenceCorpus, idCol, vecCol, nClusters)
    // an EMPTY reference means nothing to dedup against — every row
    // passes. Without this guard the assignment column is null (argmax
    // of an empty centroid array) and the !is_dup filter would drop
    // every arriving row: the exact inverse of the right semantics.
    if (centroids.isEmpty)
      return vecs.withColumn("cluster", lit(-1L))
        .withColumn("is_dup", lit(false))
    val members: Map[Long, Array[(Array[Double], Double)]] =
      referenceCorpus
        .withColumn("__c", Dedup.clusterAssignAuto(col(vecCol), centroids))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__c"))
            .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))))
        .filter(col("__rk") <= maxPerCluster)
        .select(col("__c"), col(vecCol))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (c, rows) =>
          c -> rows.map { r =>
            val v = r.getSeq[Float](1).toArray.map(_.toDouble)
            (v, math.sqrt(v.map(x => x * x).sum))
          }
        }
    val spark = vecs.sparkSession
    val bc = spark.sparkContext.broadcast(members)
    val isDup = udf { (vec: Seq[Float], cluster: Long) =>
      val v = vec.toArray.map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      bc.value.getOrElse(cluster, Array.empty[(Array[Double], Double)])
        .exists { case (m, mn) =>
          var d = 0.0; var i = 0
          while (i < v.length) { d += v(i) * m(i); i += 1 }
          n > 0 && mn > 0 && d / (n * mn) >= tau
        }
    }
    vecs.withColumn("cluster", Dedup.clusterAssignAuto(col(vecCol), centroids))
      .withColumn("is_dup", isDup(col(vecCol), col("cluster")))
      .filter(!col("is_dup"))
  }

  final case class DocIn(docId: Long, text: String)

  /** One incrementally-detected LSH candidate pair (a < b), tagged
    * with the band that collided. The same pair can surface from
    * several bands — downstream dedupes, exactly like the batch
    * operator's DISTINCT. */
  final case class NearDupCandidate(a: Long, b: Long, band: Int)

  /** Bounded bucket state: retained doc ids + count of evictions. */
  final case class BucketState(ids: Seq[Long], overflow: Long)

  /** Streaming MinHash-LSH near-duplicate candidates — the incremental
    * form of [[graft.operators.Dedup.minhashCandidatePairs]] for
    * ingest-time dedup: each arriving document's signature is computed
    * per-row (word split → shingles → the same h1 XOR j·h2 double-hash
    * family as the batch operator — no window, so it runs on an
    * unbounded stream), banded, and matched against a bounded per-
    * (band, key) bucket of previously seen doc ids. State is
    * O(maxBucket) ids per OCCUPIED bucket; past the cap new ids still
    * pair against the retained sample but are not themselves retained
    * (overflow counted), so one degenerate bucket (e.g. boilerplate
    * shingles) cannot grow state without bound. */
  /** `stateTtlMs > 0` bounds TOTAL state for unbounded streams: each
    * bucket's state expires `stateTtlMs` after its last update
    * (processing time), so state tracks the retention horizon's
    * distinct content instead of all content ever seen. The r14
    * StreamingSoak measured the default (no TTL) growing ∝ distinct
    * buckets — 14M bucket keys / 5.1 GB after 1.8M unique docs —
    * which is the correct exact semantics but needs a horizon to run
    * forever; dedup-within-horizon is the standard ingest contract. */
  def streamingNearDupCandidates(docs: Dataset[DocIn], shingleSize: Int,
                                 numHashes: Int, rowsPerBand: Int,
                                 maxBucket: Int = 64,
                                 stateTtlMs: Long = 0L): Dataset[NearDupCandidate] = {
    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val outEnc: Encoder[NearDupCandidate] = Encoders.product[NearDupCandidate]
    implicit val keyEnc: Encoder[(Int, String)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val rowEnc: Encoder[(Int, String, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.scalaLong)
    val nBands = numHashes / rowsPerBand
    // identical bits to Dedup.minhashSignatures(HashFamily.Xxhash):
    // same shingle strings (words joined by single spaces), same base
    // hashes, same XOR combine
    val withHs = docs.toDF()
      .withColumn("__ws", split(trim(col("text")), "\\s+"))
      .filter(size(col("__ws")) >= shingleSize)
      .withColumn("__hs", expr(
        s"""transform(sequence(0, size(__ws) - $shingleSize),
              i -> named_struct(
                'h1', xxhash64(concat_ws(' ', slice(__ws, i + 1, $shingleSize))),
                'h2', shiftrightunsigned(
                  xxhash64('salt', concat_ws(' ', slice(__ws, i + 1, $shingleSize))), 16)))"""))
    val sigCols = (0 until numHashes).map(j =>
      expr(s"array_min(transform(__hs, h -> h.h1 ^ (${j}L * h.h2)))"))
    val bandCol = explode(array((0 until nBands).map { b =>
      val key = concat_ws(",",
        (0 until rowsPerBand).map(r => sigCols(b * rowsPerBand + r).cast("string")): _*)
      struct(lit(b).as("band"), key.as("key"))
    }: _*))
    withHs.withColumn("__band", bandCol)
      .select(col("__band.band"), col("__band.key"), col("docId"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, key, _) => (band, key) }
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append(),
        if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (bucket: (Int, String), rows: Iterator[(Int, String, Long)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past the TTL: drop it (ids outside the
            // retention horizon stop pairing — the horizon contract)
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(BucketState(Vector.empty, 0L))
            var ids = s.ids.toVector
            var overflow = s.overflow
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
            rows.foreach { case (band, _, id) =>
              if (!ids.contains(id)) {
                ids.foreach { prev =>
                  out += NearDupCandidate(math.min(prev, id), math.max(prev, id), band)
                }
                if (ids.length < maxBucket) ids = ids :+ id else overflow += 1
              }
            }
            state.update(BucketState(ids, overflow))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }
}
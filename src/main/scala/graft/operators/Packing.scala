package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training: the concat-and-chunk manifest.
  *
  * Training pipelines concatenate documents (with one separator token
  * after each) into a single token stream and cut it into fixed-size
  * context windows. This operator emits the per-document manifest of
  * that layout — global start offset and the window range the doc
  * lands in — deterministically ordered by a numeric id column, so
  * shards of the corpus can be materialized independently and any two
  * runs agree bit-for-bit.
  *
  * Scale shape: the global prefix sum is NOT a single-partition
  * `Window.orderBy` (a serial bottleneck at any real scale). Instead:
  * contiguous id-range shards → per-shard token totals (one tiny agg,
  * `nShards` rows) → driver cumsum → broadcast shard offsets →
  * per-shard window cumsum. Every corpus-sized step is partitioned;
  * the serial part is an `nShards`-row scan on the driver.
  */
object Packing {

  /** Exact integral floor-division for non-negative longs. The
    * remainder subtraction stays in long arithmetic and the division
    * runs in decimal(38,0) — Column's `/` is DOUBLE division, which
    * silently rounds quotients above 2^53 (real for the global token
    * offsets of a 100-TB stream; same hazard RangeJoin.joinBand
    * documents for nanosecond epochs). */
  private[operators] def intDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Per-document packing manifest: `n_tokens`, `start_offset` (global
    * position of the doc's first token in the concatenated stream,
    * counting one separator after each doc), `bin_first`/`bin_last`
    * (the `ctxLen`-sized windows the doc's tokens touch — docs may
    * straddle a boundary; empty docs occupy their start window), and
    * `n_bins`. `idCol` must be numeric: it defines the deterministic
    * concatenation order. */
  def packManifest(docs: DataFrame, idCol: String, textCol: String,
                   ctxLen: Int, nShards: Int = 256,
                   nTokens: Option[Column] = None): DataFrame = {
    // nTokens swaps the tokenizer (e.g. the BPE state's separator
    // count) without touching the packing layout machinery
    val base = docs.select(col(idCol),
      nTokens.getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .as("n_tokens"))
    val mmRow = base.agg(min(col(idCol)), max(col(idCol)),
      sum(when(col("n_tokens").isNull, 1L).otherwise(0L))).collect()(0)
    // fail fast, not silently wrong: an empty corpus yields NULL
    // min/max (the cast below would NPE opaquely), and a NULL token
    // count would drop out of every cumulative sum while its own
    // manifest row survives with all-NULL layout columns
    require(!mmRow.isNullAt(0),
      s"packManifest: empty corpus — nothing to lay out")
    require(mmRow.getLong(2) == 0L,
      s"packManifest: ${mmRow.getLong(2)} docs with NULL token count " +
        s"(NULL '$textCol'?) — drop or impute before packing")
    val (lo, hi) = (mmRow.toSeq(0).asInstanceOf[Number].longValue,
      mmRow.toSeq(1).asInstanceOf[Number].longValue)
    // subtractExact: full-range ids (e.g. raw xxhash64 keys) would wrap
    // hi − lo negative, collapse span to 1 and interleave shard sort
    // order with wrapped (id − lo) values — silently wrong offsets
    val range =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          s"packManifest: id range [$lo, $hi] spans more than 2^63 — " +
            "re-key (e.g. row_number) before packing")
      }
    val span = math.max(1L, range / nShards + 1)
    val sharded = base.withColumn("__s", intDiv(col(idCol) - lo, span))
    // per-shard totals -> driver-side exclusive prefix -> broadcast
    val totals = sharded.groupBy("__s")
      .agg(sum(col("n_tokens") + 1L).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (s, t)) => (s, acc + t) }
    val offsetRows = totals.map(_._1).zip(offsets.map(_._2))
    val spark = docs.sparkSession
    import spark.implicits._
    val offFrame = broadcast(offsetRows.toSeq.toDF("__s", "__off"))
    val w = Window.partitionBy(col("__s")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("__off") + sum(col("n_tokens") + 1L).over(w) -
      (col("n_tokens") + 1L)
    val manifest = sharded.join(offFrame, "__s")
      .withColumn("start_offset", start)
    val last = col("start_offset") + greatest(col("n_tokens"), lit(1L)) - 1L
    manifest.select(col(idCol), col("n_tokens"), col("start_offset"),
        intDiv(col("start_offset"), ctxLen).as("bin_first"),
        intDiv(last, ctxLen).as("bin_last"))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1L)
  }

  /** Per-window census of the packed layout: how many documents start
    * in each window (`n_docs_start`) and how many of those straddle
    * OUT past its right boundary (`n_straddle_out` — attributed to the
    * window the doc STARTS in) — the packing-efficiency signal
    * (straddle fraction ≈ wasted or cross-doc-attention tokens).
    * Windows where no document starts (fully covered by a long doc's
    * tail) carry no information under this attribution and are absent.
    * One small aggregation over the manifest. */
  def packCensus(manifest: DataFrame): DataFrame =
    manifest.groupBy(col("bin_first").as("bin"))
      .agg(count(lit(1)).as("n_docs_start"),
        sum(when(col("bin_last") > col("bin_first"), 1L).otherwise(0L))
          .as("n_straddle_out"))
}

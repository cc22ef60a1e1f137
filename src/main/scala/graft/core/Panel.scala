package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Panel (long-format) frame conventions.
  *
  * The reference (functime) treats every frame as positional:
  * columns(0)=entity, columns(1)=time, columns(2)=target
  * (reference: base/transformer.py:56, base/forecaster.py:178-205).
  * We make the roles explicit instead — a [[Panel]] names the entity
  * key, the ordering columns (time plus an optional tiebreaker for
  * deterministic ordering, which Polars gets implicitly from row
  * order), and the value column under analysis.
  *
  * Scale notes: every per-entity operation here hash-partitions on the
  * entity key (one shuffle); all windows reuse the same
  * partitionBy(entity).orderBy(order) spec so Catalyst collapses them
  * into a single sort per stage. At 100 TB the entity key is the unit
  * of parallelism — operators never collect per-entity data to the
  * driver.
  */
final case class Panel(
    df: DataFrame,
    entity: Seq[String],
    order: Seq[String],
    value: String) {

  def x: Column = col(value)
  def entityCols: Seq[Column] = entity.map(col)
  def orderCols: Seq[Column] = order.map(col)

  /** The canonical per-entity ordered window. */
  def w: WindowSpec = Window.partitionBy(entityCols: _*).orderBy(orderCols: _*)

  /** Per-entity window without ordering (whole-group frame). */
  def we: WindowSpec = Window.partitionBy(entityCols: _*)

  /** groupBy entity, apply aggregate expressions. */
  def agg(first: Column, rest: Column*): DataFrame =
    df.groupBy(entityCols: _*).agg(first, rest: _*)

  def withColumn(name: String, c: Column): Panel =
    copy(df = df.withColumn(name, c))

  /** Row index 0..n-1 per entity in time order. */
  def withRowIdx(name: String = "__rn"): Panel =
    copy(df = df.withColumn(name, row_number().over(w) - lit(1)))
}

object Panel {
  /** events table as a panel: user_id / ts / value. event_id breaks
    * timestamp ties so ordering is deterministic (Spark has no stable
    * row order — SURVEY.md §7.5(2)). */
  def events(spark: SparkSession, dir: String): Panel =
    Panel(Tables(spark, dir, "events"), Seq("user_id"), Seq("ts", "event_id"), "value")
}

/** Parquet table loader for the driver's testdata layout.
  *
  * The events table's `ts` has shipped as TIMESTAMP(NANOS) (which
  * Spark 4 has no type for — read as long via legacy.parquet
  * .nanosAsLong and divided down) and, since round 5, as plain
  * TIMESTAMP(MICROS)/NTZ. Branch on the LOADED dtype so either
  * generation of the data works — hardcoding one silently crashed
  * every events-based query when the driver regenerated the corpus. */
object Tables {
  // Per-SESSION table-handle memo (r15): every registry query used to
  // call spark.read.parquet(path) afresh, paying a directory listing,
  // a footer/schema-inference Spark JOB and the ts-dtype branch at
  // PLAN time — ~20-40 ms × (tables touched) × 255 queries of pure
  // driver latency in the bench (JobProfile: one "parquet at
  // Panel.scala" job in every query). Reusing the analyzed handle is
  // exactly what registering the table in a catalog once would do; no
  // DATA is cached — every action still scans the parquet files.
  // WeakHashMap on the session so closed sessions (tests spin up many)
  // unpin their frames; access synchronized on the outer map.
  private val memo =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true at
    * BUILD time (runtime set does not reach the parquet reader). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.synchronized {
      memo.computeIfAbsent(spark, _ => new java.util.HashMap[String, DataFrame]())
        .computeIfAbsent(s"$dir/$name", _ => load(spark, dir, name))
    }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // ns-as-long (legacy)
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType => // µs, no zone
          // session TZ is pinned UTC everywhere, so NTZ wall-clock ==
          // the instant the ns epoch values encoded; cast is lossless
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }

  /** Persist a panel bucketed by its entity key: every later
    * groupBy/window/join on that key reads the buckets' existing
    * HashPartitioning and skips the entity shuffle entirely — the
    * co-location strategy for a 100 TB panel that is re-analyzed many
    * times (amortize ONE shuffle at ingest across every query).
    * Requires a session with catalog support (default local session
    * works: spark-warehouse dir). */
  def bucketizeByEntity(df: DataFrame, tableName: String,
                        entityCols: Seq[String], numBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    // the default session catalog is in-memory: after a restart it no
    // longer knows the table but its warehouse directory persists, and
    // saveAsTable refuses the "orphaned" location — drop both first
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, tableName)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write
      .bucketBy(numBuckets, entityCols.head, entityCols.tail: _*)
      .sortBy(entityCols.head, entityCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * At 100 TB a handful of hot entities (one user producing 1% of all
  * events) turn a shuffled equi-join into a single straggling reducer.
  * AQE's skew-join split handles sort-merge joins whose skew is
  * visible in shuffle stats at runtime; this utility is the explicit,
  * planner-independent form — salting — for when the dim side is too
  * big to broadcast but small enough to replicate `buckets`× (the
  * classic middle ground: per-entity aggregate/profile tables).
  */
object Skew {

  /** Salted inner equi-join on `keys`: the big probe side gets a
    * deterministic salt in [0, buckets) derived from `saltSource` (any
    * column that varies WITHIN a key group — an event id, a timestamp;
    * never the join key itself), the dim side is replicated once per
    * bucket, and the join runs on keys :+ salt — a hot key's rows
    * spread across `buckets` reducers instead of piling on one.
    *
    * Result is row-identical to `big.join(dim, keys)`: salting only
    * re-partitions the work. Shuffle cost: big side unchanged, dim
    * side ×buckets (choose buckets ≈ executor-cores per hot key's
    * desired spread; 8-32 is typical).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, saltSource: Column): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val r = dim.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}

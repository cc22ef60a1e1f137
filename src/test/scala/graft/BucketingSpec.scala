package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Bucketed-by-entity persistence: aggregations and self-joins on the
  * entity key must NOT shuffle — the buckets carry the
  * HashPartitioning. This is the amortize-one-shuffle-at-ingest
  * strategy documented in SCALE.md. */
class BucketingSpec extends SparkSpec {

  test("groupBy(entity) over a bucketed table plans no exchange") {
    import spark.implicits._
    val df = spark.range(1000).select(
      (col("id") % 50).as("entity"), col("id").as("t"),
      (col("id") % 7).cast("double").as("value"))
    val bucketed = Tables.bucketizeByEntity(df, "bspec_events", Seq("entity"), 4)
    val agg = bucketed.groupBy("entity").agg(sum("value").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregate should not shuffle:\n$plan")
    // and the numbers are right
    assert(agg.count() == 50)
    val direct = df.groupBy("entity").agg(sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    agg.collect().foreach(r => assert(direct(r.getLong(0)) == r.getDouble(1)))
  }

  test("bucketed-to-bucketed equi-join on entity plans no exchange") {
    import spark.implicits._
    val a = spark.range(200).select((col("id") % 20).as("entity"), col("id").as("x"))
    val b = spark.range(200).select((col("id") % 20).as("entity"), (col("id") * 2).as("y"))
    val ba = Tables.bucketizeByEntity(a, "bspec_a", Seq("entity"), 4)
    val bb = Tables.bucketizeByEntity(b, "bspec_b", Seq("entity"), 4)
    // aggregate both sides first so the join key is unique per side
    val j = ba.groupBy("entity").agg(sum("x").as("sx"))
      .join(bb.groupBy("entity").agg(sum("y").as("sy")), "entity")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(j.count() == 20)
  }
}

package graft

import graft.functions.ArrayDotProduct
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native codegen'd dot-product expression vs the HOF formulation. */
class ArrayDotSpec extends SparkSpec {

  test("native array_dot equals the higher-order-function dot (float arrays)") {
    import spark.implicits._
    val d = spark.range(1000).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => (pmod(xxhash64(col("id"), i), lit(997)).cast("double") / 997).cast("float")).as("v"),
      transform(sequence(lit(1), lit(64)),
        i => (pmod(xxhash64(i, col("id")), lit(991)).cast("double") / 991).cast("float")).as("w"))
    val diff = d.select(max(abs(
      Similarity.dot(col("v"), col("w")) - Similarity.dotHof(col("v"), col("w")))))
      .first().getDouble(0)
    assert(diff < 1e-9, s"max diff $diff")
  }

  test("array_dot handles double arrays, nulls, and length mismatch") {
    import spark.implicits._
    val d = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),   // 32
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))),        // length mismatch → null (like dotHof)
      (None, Some(Seq(1.0)))                                    // null input → null
    ).toDF("a", "b")
    val out = d.select(ArrayDotProduct.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("cosineTopK ranks the most-similar corpus vector first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(corpus.filter(col("vec_id") === 1), corpus,
      "vec_id", "embedding", k = 2).orderBy("rnk").collect()
    assert(out(0).getAs[Long]("n_id") == 2L) // nearest to (1,0) is (0.9,0.1)
    assert(out(1).getAs[Long]("n_id") == 3L)
  }
}
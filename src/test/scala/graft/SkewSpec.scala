package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join skew mitigation: result parity with the plain join,
  * salt actually in the join keys, and hot-key rows spread across
  * salt buckets. */
class SkewSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  // skewed: key 1 holds 90% of the rows
  private lazy val big = SparkSpec.session.range(2000)
    .select(when(col("id") < 1800, 1L).otherwise(col("id") % 50).as("k"),
      col("id").as("rid"), (col("id") * 0.5).as("v"))
  private lazy val dim = SparkSpec.session.range(50)
    .select(col("id").as("k"), concat(lit("g"), col("id") % 5).as("grp"))

  test("salted join is row-identical to the plain join") {
    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), 8, col("rid"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("join executes on key+salt and the hot key spans many buckets") {
    val salted = Skew.saltedJoin(big, dim, Seq("k"), 8, col("rid"))
    // the physical join condition carries the salt column
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
    // the hot key's rows hash into (nearly) all 8 salt buckets, so no
    // single reducer owns 90% of the work any more
    val spread = big.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("rid")), lit(8)).as("s"))
      .distinct().count()
    assert(spread >= 7, s"hot key spread over only $spread of 8 buckets")
  }
}

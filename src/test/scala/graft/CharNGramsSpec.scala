package graft

import graft.functions.CharNGrams
import org.apache.spark.sql.functions._

/** Native codegen'd char_ngrams vs the HOF formulation. */
class CharNGramsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("char_ngrams equals transform(sequence, substr) on real-ish text") {
    val d = spark.range(500).select(
      concat_ws(" ", (0 until 12).map(w =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(w)), lit(300)))): _*).as("s"))
    val native = d.select(explode(CharNGrams.ngrams(col("s"), 3)).as("g"))
    val hof = d.select(explode(
      expr("transform(sequence(1, length(s) - 2), i -> substr(s, i, 3))")).as("g"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    assert(native.count() == hof.count())
  }

  test("char_ngrams edges: short strings, exact length, unicode, null, n<=0") {
    val out = Seq("ab", "abc", "abcd", "héllo", null)
      .toDF("s").select(CharNGrams.ngrams(col("s"), 3).as("g"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(out(0) == Seq.empty)              // shorter than n
    assert(out(1) == Seq("abc"))             // exactly n
    assert(out(2) == Seq("abc", "bcd"))
    assert(out(3) == Seq("hél", "éll", "llo")) // code-point windows
    assert(out(4) == null)                   // null propagates
    val z = Seq("abc").toDF("s")
      .select(CharNGrams.ngrams(col("s"), 0).as("g")).first().getSeq[String](0)
    assert(z == Seq.empty)
  }

  test("char_ngrams registers as a SQL function via GraftExtensions") {
    val ident = new org.apache.spark.sql.catalyst.FunctionIdentifier("char_ngrams")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharNGrams].getName, "char_ngrams")
      registry.registerFunction(ident, info,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CharNGrams(children.head, children(1)))
    }
    val got = spark.sql("SELECT char_ngrams('spark', 2) AS g").first().getSeq[String](0)
    assert(got == Seq("sp", "pa", "ar", "rk"))
  }
}

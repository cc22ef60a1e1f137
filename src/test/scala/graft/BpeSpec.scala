package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Byte-pair encoding: greedy merge training and sequential-merge
  * encoding against hand-computed expectations. */
class BpeSpec extends SparkSpec {

  private val S = TextAnalysis.BpeSep

  test("bpeTrain learns the classic greedy merges on a toy corpus") {
    import spark.implicits._
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the Sennrich
    // example family. Pair counts, round 1: (e,s) 6+3=9, (s,t) 9,
    // (w,e) 2+6=8 ... tie (e,s) vs (s,t) → (count desc, a, b) picks
    // ("e","s"). Round 2: (es,t) 9 wins. Round 3: (n,e) 6, (w,i) 3,
    // (l,o) 7, (o,w) 7 → (l,o) by tie-break vs (o,w).
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 3)
    assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o"))
  }

  test("bpeEncode applies merges in rank order and counts tokens") {
    import spark.implicits._
    val df = Seq((1L, "the then"), (2L, "xyz"), (3L, "")).toDF("id", "text")
    val out = TextAnalysis.bpeEncode(df, "text",
      Seq("t" -> "h", "th" -> "e", "e" -> "n"))
      .select(col("id"), col("__bpe"), col("bpe_n_tokens"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // "the then": t+h → th; th+e → the; e+n → en (inside "then" the
    // th+e merge already consumed the e, so "then" = the + n)
    assert(out(1L) == ((s"${S}the${S} ${S}the${S}n", 4L)))
    assert(out(2L) == ((s"${S}x${S}y${S}z", 3L)))
    assert(out(3L) == (("", 0L)))
  }

  test("merges never cross whitespace boundaries") {
    import spark.implicits._
    // pair (a,b) adjacent only across a space — must NOT merge
    val df = Seq((1L, "a b")).toDF("id", "text")
    val out = TextAnalysis.bpeEncode(df, "text", Seq("a" -> "b"))
      .select(col("bpe_n_tokens")).collect()(0).getLong(0)
    assert(out == 3L) // a, space, b — untouched
  }

  test("encode is scan-shaped: no exchanges in the plan") {
    import spark.implicits._
    val df = Seq((1L, "text")).toDF("id", "text")
    val plan = TextAnalysis.bpeEncode(df, "text", Seq("t" -> "e"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

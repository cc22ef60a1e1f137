package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-hit counter: `word_set_hits(s, patterns)` ≡
  * `regexp_count(s, "\bp1\b|\bp2\b|…")` for literal lowercase-ASCII
  * word/phrase alternatives — the langId / quality-score /
  * gopher-rules ingredient, which with 4 languages × ~7 alternatives
  * was the dominant per-row regex cost after normalization moved to
  * [[AsciiClean]].
  *
  * Exact replication of the Java-regex scan (the oracles keep the
  * regex form): alternatives are tried in ORDER at each position,
  * matches are non-overlapping (the scanner jumps past a match,
  * advances one byte otherwise), and `\b` is the default ASCII
  * boundary (`\w` = [a-zA-Z0-9_] — Unicode bytes are ≥ 0x80, never
  * word bytes, so multi-byte characters are boundaries, matching the
  * regex's view of the same string). Every alternative starts and
  * ends with a word byte, so only positions at a word-run start can
  * match — the scan skips the rest, which is equivalence, not
  * approximation. Phrases with internal spaces ("de la") match as
  * exact byte sequences with boundaries at both ends, exactly like
  * the embedded literal regex. Pinned against the regex twin on
  * adversarial fuzz in PipelineSpec. */
case class WordSetHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  // Construction-time contract check: patterns are matched as raw
  // byte sequences, so a non-ASCII char would be lossily encoded by
  // US_ASCII to '?' and the scanner would silently match the wrong
  // literal (diverging from the regex twin with no error). The scan's
  // skip-ahead also assumes every alternative starts and ends with a
  // word byte ([a-zA-Z0-9_]) — enforce both here, not at eval time.
  patterns.foreach { p =>
    require(p.nonEmpty && p.forall(_ < 0x80),
      s"word_set_hits pattern must be non-empty ASCII, got '$p'")
    def isWordChar(c: Char) = c.isLetterOrDigit && c < 0x80 || c == '_'
    require(isWordChar(p.head) && isWordChar(p.last),
      s"word_set_hits pattern must start and end with a word char " +
        s"[a-zA-Z0-9_], got '$p'")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "word_set_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  @transient private lazy val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  override def nullSafeEval(s: Any): Any =
    WordSetHits.count(s.asInstanceOf[UTF8String], patBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("wordSetPats", patBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordSetHits.count($c, $pats)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetHits =
    copy(child = newChild)
}

object WordSetHits {
  import org.apache.spark.sql.GraftSqlBridge

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Leftmost-first non-overlapping scan, alternatives in order. */
  def count(s: UTF8String, pats: Array[Array[Byte]]): Long = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      if (isWord(b(i)) && (i == 0 || !isWord(b(i - 1)))) {
        var matched = 0
        var p = 0
        while (matched == 0 && p < pats.length) {
          val pat = pats(p)
          val m = pat.length
          if (i + m <= n && (i + m == n || !isWord(b(i + m)))) {
            var j = 0
            while (j < m && b(i + j) == pat(j)) j += 1
            if (j == m) matched = m
          }
          p += 1
        }
        if (matched > 0) { cnt += 1; i += matched } else i += 1
      } else i += 1
    }
    cnt
  }

  /** Column-API entry point; `patterns` are literal lowercase-ASCII
    * words/phrases in alternation order. */
  def hits(s: Column, patterns: Seq[String]): Column =
    GraftSqlBridge.column(WordSetHits(GraftSqlBridge.expression(s), patterns))
}

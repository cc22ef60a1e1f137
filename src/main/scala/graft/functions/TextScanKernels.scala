package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The remaining per-row text-scan kernels (round 5): each replaces
  * one regex the quality filters run on every document, replicated
  * byte-exactly (fuzz-pinned against the builtin twin in
  * PipelineSpec; oracles keep the regex forms). All byte-level scans
  * are sound on UTF-8: multi-byte code points have every byte ≥ 0x80,
  * outside each ASCII class, and code points are counted by skipping
  * continuation bytes (0b10xxxxxx).
  *
  * - [[AlphaTokenCount]] ≡ `regexp_count(s, "(^|\s)[^\s]*[a-z][^\s]*")`
  *   — the Gopher alphabetic-token band. Each match anchors at
  *   start-or-whitespace and swallows one whole whitespace-delimited
  *   token, so the count is "#tokens containing ≥ 1 [a-z]"; beyond
  *   speed this kills the pattern's O(len²) backtracking on long
  *   a-z-free tokens.
  * - [[NonWsCharCount]] ≡ `length(regexp_replace(s, "\s+", ""))` —
  *   the mean-word-length numerator (code points that are not ASCII
  *   whitespace).
  * - [[AlnumSpaceCount]] ≡ `length(s) - length(regexp_replace(s,
  *   "[a-zA-Z0-9 ]", ""))` — the punctRatio numerator (characters
  *   inside the class; single-byte, so a byte count).
  * - [[BpeishCount]] ≡ `regexp_count(s,
  *   "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")` — alpha runs + digit runs +
  *   every other non-whitespace code point, the cheap tokenizer-load
  *   proxy.
  */
abstract class TextScanKernel extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }
}

case class AlphaTokenCount(child: Expression) extends TextScanKernel {
  override def prettyName: String = "alpha_token_count"
  override def nullSafeEval(s: Any): Any =
    TextScanKernels.alphaTokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanKernels.alphaTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): AlphaTokenCount =
    copy(child = newChild)
}

case class NonWsCharCount(child: Expression) extends TextScanKernel {
  override def prettyName: String = "non_ws_char_count"
  override def nullSafeEval(s: Any): Any =
    TextScanKernels.nonWsChars(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanKernels.nonWsChars($c)")
  override protected def withNewChildInternal(newChild: Expression): NonWsCharCount =
    copy(child = newChild)
}

case class AlnumSpaceCount(child: Expression) extends TextScanKernel {
  override def prettyName: String = "alnum_space_count"
  override def nullSafeEval(s: Any): Any =
    TextScanKernels.alnumSpace(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanKernels.alnumSpace($c)")
  override protected def withNewChildInternal(newChild: Expression): AlnumSpaceCount =
    copy(child = newChild)
}

/** ≡ `regexp_count(s, "[\x{4e00}-\x{9fff}]")` — the CJK-unified-
  * ideograph count langId's zh branch runs per row. Code points in
  * [U+4E00, U+9FFF] are exactly the 3-byte UTF-8 sequences from
  * E4 B8 80 to E9 BF BF; decoded and range-checked directly. */
case class CjkCharCount(child: Expression) extends TextScanKernel {
  override def prettyName: String = "cjk_char_count"
  override def nullSafeEval(s: Any): Any =
    TextScanKernels.cjkChars(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanKernels.cjkChars($c)")
  override protected def withNewChildInternal(newChild: Expression): CjkCharCount =
    copy(child = newChild)
}

case class BpeishCount(child: Expression) extends TextScanKernel {
  override def prettyName: String = "bpeish_count"
  override def nullSafeEval(s: Any): Any =
    TextScanKernels.bpeish(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanKernels.bpeish($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeishCount =
    copy(child = newChild)
}

object TextScanKernels {
  import org.apache.spark.sql.GraftSqlBridge

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80
  private def isLowerAz(b: Byte): Boolean = b >= 'a' && b <= 'z'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** #whitespace-delimited tokens containing ≥ 1 lowercase a-z. */
  def alphaTokens(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var cnt = 0
    var inTok = false
    var tokHasLower = false
    while (i < b.length) {
      if (isWs(b(i))) {
        if (inTok && tokHasLower) cnt += 1
        inTok = false; tokHasLower = false
      } else {
        inTok = true
        if (isLowerAz(b(i))) tokHasLower = true
      }
      i += 1
    }
    if (inTok && tokHasLower) cnt += 1
    cnt
  }

  /** #code points that are not ASCII whitespace. */
  def nonWsChars(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var cnt = 0
    while (i < b.length) {
      val c = b(i)
      if (!isCont(c) && !isWs(c)) cnt += 1
      i += 1
    }
    cnt
  }

  /** #characters in [a-zA-Z0-9 ] (single-byte class → byte count). */
  def alnumSpace(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var cnt = 0
    while (i < b.length) {
      val c = b(i)
      if (isAlpha(c) || isDigit(c) || c == ' ') cnt += 1
      i += 1
    }
    cnt
  }

  /** alpha runs + digit runs + every other non-ws code point. */
  def bpeish(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var cnt = 0
    var prevAlpha = false
    var prevDigit = false
    while (i < b.length) {
      val c = b(i)
      if (isAlpha(c)) {
        if (!prevAlpha) cnt += 1
        prevAlpha = true; prevDigit = false
      } else if (isDigit(c)) {
        if (!prevDigit) cnt += 1
        prevDigit = true; prevAlpha = false
      } else {
        prevAlpha = false; prevDigit = false
        if (!isWs(c) && !isCont(c)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** #code points in [U+4E00, U+9FFF]. 3-byte UTF-8 decode: lead
    * 0xE4..0xE9, two continuation bytes; cp = ((l & 0x0F) << 12) |
    * ((c1 & 0x3F) << 6) | (c2 & 0x3F). Malformed sequences never
    * reach here (UTF8String holds validated UTF-8). */
  def cjkChars(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var cnt = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c >= 0xE4 && c <= 0xE9 && i + 2 < b.length) {
        val cp = ((c & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) cnt += 1
        i += 3
      } else if (c < 0x80) i += 1
      else if (c < 0xE0) i += 2
      else if (c < 0xF0) i += 3
      else i += 4
    }
    cnt
  }

  def cjkCharCount(s: Column): Column =
    GraftSqlBridge.column(CjkCharCount(GraftSqlBridge.expression(s)))

  def alphaTokenCount(s: Column): Column =
    GraftSqlBridge.column(AlphaTokenCount(GraftSqlBridge.expression(s)))
  def nonWsCharCount(s: Column): Column =
    GraftSqlBridge.column(NonWsCharCount(GraftSqlBridge.expression(s)))
  def alnumSpaceCount(s: Column): Column =
    GraftSqlBridge.column(AlnumSpaceCount(GraftSqlBridge.expression(s)))
  def bpeishCount(s: Column): Column =
    GraftSqlBridge.column(BpeishCount(GraftSqlBridge.expression(s)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token count: `ws_token_count(s)` ≡
  * `when(length(trim(s)) = 0, 0).otherwise(size(split(trim(s), "\s+")))`
  * — the tokenCount every quality filter, packing manifest and corpus
  * census runs per row. The regex `split` materializes an ARRAY OF
  * SUBSTRINGS per row just to take its size; this is one generated
  * byte loop, no allocation.
  *
  * Exact replication of the composed builtins (the oracles keep the
  * regex form): `trim` strips 0x20 SPACES only (tabs/newlines stay);
  * Java `split(re, -1)` segments = separators + 1, INCLUDING a
  * leading/trailing empty piece when the trimmed string starts/ends
  * with remaining whitespace — so the count is (#maximal \s-runs) + 1
  * on the space-trimmed bytes, and 0 iff the trimmed string is empty.
  * `\s` is the default ASCII class [ \t\n\x0B\f\r]; multi-byte UTF-8
  * units are ≥ 0x80 and never whitespace, so byte scanning is sound.
  * Pinned against the builtin chain on adversarial fuzz in
  * PipelineSpec. */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "ws_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    WsTokenCount.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {
  import org.apache.spark.sql.GraftSqlBridge

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def count(s: UTF8String): Int = {
    val b = s.getBytes
    // trim = strip 0x20 spaces only (the builtin trim's behavior)
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val ws = isWs(b(i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }

  /** Column-API entry point. */
  def of(s: Column): Column =
    GraftSqlBridge.column(WsTokenCount(GraftSqlBridge.expression(s)))
}

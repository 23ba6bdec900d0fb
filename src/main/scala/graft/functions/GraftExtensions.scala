package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the idiomatic packaging for the
  * engine's native expressions so a cluster enables them with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (no driver code changes). Per-session registration remains available
  * via GraftFunctions.registerAll for embedded use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("half_float"),
      info(classOf[HalfFloat], "half_float"),
      (exprs: Seq[Expression]) => {
        GraftFunctions.requireArity("half_float", exprs, 1)
        HalfFloat(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64"),
      (exprs: Seq[Expression]) => {
        GraftFunctions.requireArity("simhash64", exprs, 1)
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      info(classOf[DotI64], "dot_i64"),
      (exprs: Seq[Expression]) => {
        GraftFunctions.requireArity("dot_i64", exprs, 2)
        DotI64(exprs(0), exprs(1))
      }))
  }
}

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

  /** Iterates the SAME registry as GraftFunctions.registerAll — the two
    * registration surfaces cannot drift apart. */
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

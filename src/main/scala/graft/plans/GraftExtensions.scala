package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native graft functions
  * for SQL use. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (cluster submit) or by
  * calling [[GraftExtensions.register]] on a live session (tests, REPL).
  *
  * After registration: `SELECT graft_dot(a, b)`, `SELECT graft_norm(v)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotEntry)
    ext.injectFunction(GraftExtensions.normEntry)
  }
}

object GraftExtensions {
  private type Entry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotEntry: Entry = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1)))

  val normEntry: Entry = (
    FunctionIdentifier("graft_norm"),
    new ExpressionInfo(classOf[FloatNorm].getName, "graft_norm"),
    (exprs: Seq[Expression]) => FloatNorm(exprs.head))

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    Seq(dotEntry, normEntry).foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}

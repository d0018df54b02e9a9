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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
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

  val sortedIntersectEntry: Entry = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
      "graft_sorted_intersect_count"),
    (exprs: Seq[Expression]) => SortedLongIntersectCount(exprs(0), exprs(1)))

  val minhashEntry: Entry = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignatures].getName, "graft_minhash"),
    (exprs: Seq[Expression]) => exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
          org.apache.spark.sql.types.IntegerType) =>
        MinHashSignatures(exprs(0), k)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3000",
        Map("message" -> "graft_minhash(arr, k): k must be an INT literal"))
    })

  val entries: Seq[Entry] =
    Seq(dotEntry, normEntry, sortedIntersectEntry, minhashEntry)

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    entries.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}

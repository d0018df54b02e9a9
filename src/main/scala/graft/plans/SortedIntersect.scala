package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Intersection size of two SORTED, DISTINCT `array<bigint>` columns via a
  * fused two-pointer merge — no per-row hash set, no intermediate array.
  *
  * This is the verification kernel of the near-dup pipeline: Jaccard over
  * the O(block²)/candidate pair space reduces to
  * `inter / (|a| + |b| - inter)` for set-distinct inputs, so one merge scan
  * replaces `array_intersect` + `array_union` (each of which allocates and
  * hashes). Inputs MUST be sorted ascending and duplicate-free — callers
  * prepare arrays once per document with `array_sort(array_distinct(...))`,
  * amortized over all pairs the document participates in.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  def intersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))

  /** Jaccard of two sorted-distinct long arrays in one merge scan. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val inter = intersectCount(a, b).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }
}

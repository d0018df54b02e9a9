package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-gram construction over a text column.
  *
  * Why a custom Expression (SURVEY §4.3 preference order): the built-in
  * formulation `transform(sequence(0, size-k), i -> array_join(slice(toks,
  * i+1, k), ' '))` chains four interpreted higher-order/array functions
  * and re-slices per gram — measured at ~5 µs per gram, it dominates every
  * n-gram query (gram construction was 1.2 s of q_text_ngrams' 1.35 s at
  * sf0.1). This kernel emits all grams in one pass over the split.
  *
  * Semantics match the HOF formulation exactly (same strings, same count):
  * tokens = text.split(" ", -1) (single-space, trailing empties kept, like
  * `split(text, " ")`); gram count = max(size-k, 0) + 1, so a text shorter
  * than k yields its whole token run as the single gram; grams join with a
  * single space. Verified by the unchanged DuckDB-oracle hashes of
  * q_text_ngrams / q_gopher_quality / q_decontaminate / the jaccard path.
  */
case class WordNgrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires a string input, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  def compute(s: UTF8String): ArrayData = {
    val parts = s.toString.split(" ", -1)
    val n = parts.length
    val count = math.max(n - k, 0) + 1
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(parts(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API over the native n-gram kernel. */
  def wordNgrams(text: Column, k: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(text), k))
}

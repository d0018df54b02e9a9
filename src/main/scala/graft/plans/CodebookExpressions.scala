package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native codebook-scan kernels for the trained-ANN operators (IVF / PQ).
  *
  * Why custom Expressions (SURVEY §4.3 preference order): the assignment
  * step "nearest of k trained centroids" is per-row × per-centroid work.
  * The broadcast-join + row_number formulation shuffles N·k rows per
  * assignment; a `greatest(struct(dot(v, lit), …))` chain avoids the
  * shuffle but embeds k×dims literals in the plan — analyzer/optimizer
  * cost grows with the codebook and the generated code bloats. A single
  * Expression holding the codebook as a reference object keeps the plan at
  * ONE node and the scan at one fused loop — the shape that survives both
  * a 100 TB corpus (no shuffle, codegen-resident) and a 100-query bench
  * (constant plan size).
  *
  * Arithmetic matches [[FloatDotProduct]] / [[FloatNorm]] bit-exactly
  * (sequential double accumulation, min-length dot), so swapping the
  * formulation does not move a single output value. Ties break on the
  * lowest centroid id / code: candidates iterate in ascending id order and
  * only a strictly-better score replaces the champion — exactly
  * `row_number over (ORDER BY sim DESC, id ASC) = 1`.
  */
object CodebookExpressions {

  private[plans] def dotAt(v: ArrayData, off: Int, c: Array[Float]): Double = {
    val n = math.min(v.numElements() - off, c.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += v.getFloat(off + i).toDouble * c(i).toDouble
      i += 1
    }
    acc
  }

  private[plans] def normOf(v: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = v.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  private[plans] def normOf(c: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      val x = c(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** Cell id of the max-cosine centroid (ids must be sorted ascending). */
  def nearestCell(vec: Column, cents: Seq[(Long, Array[Float])]): Column = {
    val sorted = cents.sortBy(_._1)
    Bridge.column(NearestCentroidId(Bridge.expression(vec),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }

  /** struct(cell, rv): winning cell id + residual v − centroid. */
  def assignResidual(vec: Column, cents: Seq[(Long, Array[Float])]): Column = {
    val sorted = cents.sortBy(_._1)
    Bridge.column(CentroidAssign(Bridge.expression(vec),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }

  /** array of m PQ codes (index = subspace), min-L2 per subspace. */
  def pqCodes(vec: Column, books: Seq[(Int, Long, Array[Float])], m: Int,
              dims: Int): Column = {
    val bySub = books.groupBy(_._1)
    val codes = (0 until m).map(s => bySub(s).map(_._2).sorted.toArray).toArray
    val cents = (0 until m).map { s =>
      bySub(s).sortBy(_._2).map(_._3).toArray
    }.toArray
    Bridge.column(PqEncodeCodes(Bridge.expression(vec), codes, cents, dims / m))
  }
}

trait CodebookKernel { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.sql}")
  }
}

/** argmax-cosine centroid id over a driver-trained codebook. */
case class NearestCentroidId(child: Expression, centIds: Array[Long],
                             cents: Array[Array[Float]])
    extends UnaryExpression with CodebookKernel {
  import CodebookExpressions._

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_cell"

  @transient private lazy val cnorms: Array[Double] = cents.map(normOf)

  def compute(v: ArrayData): Long = {
    val vn = normOf(v)
    var bestSim = Double.NegativeInfinity
    var bestId = centIds(0)
    var i = 0
    while (i < cents.length) {
      val sim = dotAt(v, 0, cents(i)) / (vn * cnorms(i))
      if (sim > bestSim) { bestSim = sim; bestId = centIds(i) }
      i += 1
    }
    bestId
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[NearestCentroidId].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)
}

/** argmax-cosine centroid + float residual in one pass:
  * struct(cell BIGINT, rv array<float>). */
case class CentroidAssign(child: Expression, centIds: Array[Long],
                          cents: Array[Array[Float]])
    extends UnaryExpression with CodebookKernel {
  import CodebookExpressions._

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("rv", ArrayType(FloatType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_centroid_assign"

  @transient private lazy val cnorms: Array[Double] = cents.map(normOf)

  def compute(v: ArrayData): InternalRow = {
    val vn = normOf(v)
    var bestSim = Double.NegativeInfinity
    var best = 0
    var i = 0
    while (i < cents.length) {
      val sim = dotAt(v, 0, cents(i)) / (vn * cnorms(i))
      if (sim > bestSim) { bestSim = sim; best = i }
      i += 1
    }
    val c = cents(best)
    val n = v.numElements()
    val rv = new Array[Float](n)
    var j = 0
    while (j < n) {
      // float subtraction — matches zip_with(v, cv, (x, y) => x - y)
      rv(j) = v.getFloat(j) - (if (j < c.length) c(j) else 0f)
      j += 1
    }
    InternalRow(centIds(best), new GenericArrayData(rv))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[CentroidAssign].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
}

/** PQ encoding: per subspace s, the code of the min-L2 centroid for the
  * subvector vec[s·dsub, (s+1)·dsub) — argmin (|c|² − 2 sv·c), ties to the
  * lowest code. Returns array<bigint> of m codes (index = subspace). */
case class PqEncodeCodes(child: Expression, codes: Array[Array[Long]],
                         cents: Array[Array[Array[Float]]], dsub: Int)
    extends UnaryExpression with CodebookKernel {
  import CodebookExpressions._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val csqs: Array[Array[Double]] = cents.map(_.map { c =>
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  })

  def compute(v: ArrayData): ArrayData = {
    val m = cents.length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val book = cents(s)
      val csq = csqs(s)
      var bestD2 = Double.PositiveInfinity
      var best = 0
      var i = 0
      while (i < book.length) {
        val d2 = csq(i) - 2.0 * dotAt(v, s * dsub, book(i))
        if (d2 < bestD2) { bestD2 = d2; best = i }
        i += 1
      }
      out(s) = codes(s)(best)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fused MinHash signature kernel.
  *
  * The built-in formulation — `array(sig_0, ..., sig_{k-1})` where each
  * `sig_i = array_min(transform(sh, h => xxhash64(h, i)))` — materializes k
  * intermediate arrays and evaluates k lambda closures per row. This
  * expression computes all k minima in ONE pass over the shingle array with
  * zero allocation beyond the k-long output: per element one 8-byte XXH64
  * round per hash function, unrolled inside whole-stage codegen. The hot
  * signature kernel of text near-dup at corpus scale.
  *
  * Hashing is the public XXH64 single-long variant (xxhash.com spec) with
  * the hash index as seed — engine-specific like any minhash (the declared
  * query is rows-only), deterministic everywhere.
  */
object MinHash {
  private final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private final val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private final val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  private final val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private final val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  /** XXH64 of one long with `seed` (public spec, 8-byte input path).
    * Referenced from generated code via the static forwarder. */
  def hashLong(value: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    var k1 = value * P2
    k1 = java.lang.Long.rotateLeft(k1, 31) * P1
    h ^= k1
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  /** Column API: k-min signature of a (hashed-shingle) `array<bigint>`. */
  def signatures(shingleHashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(shingleHashes), numHashes))
}

case class MinHashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires an array<bigint> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < x.numElements()) {
      val h = x.getLong(i)
      var s = 0
      while (s < numHashes) {
        val v = MinHash.hashLong(h, s)
        if (v < acc(s)) acc(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $acc = new long[$numHashes];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    long $v = graft.plans.MinHash.hashLong($h, (long) $s);
         |    if ($v < $acc[$s]) $acc[$s] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatures =
    copy(child = newChild)
}

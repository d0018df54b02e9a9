package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Inference payload grid from the reference's tests
  * (tests/test_models.py:35-44; FIXTURES.md §A.2). */
class InferenceSpec extends AnyFunSuite {

  test("value inference grid matches reference precedence") {
    assert(Inference.ofValue("foo") === Some(StringType))
    assert(Inference.ofValue("") === Some(StringType))
    assert(Inference.ofValue(0) === Some(LongType))
    assert(Inference.ofValue(42) === Some(LongType))
    assert(Inference.ofValue(42.42) === Some(DoubleType))
    // bool-before-int precedence (reference models.py:8-15 insertion order)
    assert(Inference.ofValue(true) === Some(BooleanType))
    assert(Inference.ofValue(false) === Some(BooleanType))
    // nulls never infer (schemas.py:38-40)
    assert(Inference.ofValue(null) === None)
  }

  test("merge is add-only: existing columns never widen or narrow") {
    val reg = StructType(Seq(
      StructField("id", StringType), StructField("n", LongType)))
    val incoming = StructType(Seq(
      StructField("n", DoubleType), // conflict: must NOT widen
      StructField("fresh", BooleanType)))
    val merged = Inference.mergeAddOnly(reg, incoming)
    assert(merged.fieldNames.toSeq === Seq("id", "n", "fresh"))
    assert(merged("n").dataType === LongType)
    assert(merged("fresh").dataType === BooleanType)
  }

  test("normalize collapses to the engine lattice") {
    assert(Inference.normalize(IntegerType) === LongType)
    assert(Inference.normalize(FloatType) === DoubleType)
    assert(Inference.normalize(NullType) === StringType)
    assert(Inference.normalize(ArrayType(IntegerType)) === ArrayType(LongType))
  }

  test("descriptor codec round-trips") {
    val d = FieldDescriptor("number", Some("double"), required = true, index = true)
    val f = d.toStructField("x")
    assert(f.dataType === DoubleType)
    assert(!f.nullable)
    assert(Types.fromStructField(f) === d)
  }
}

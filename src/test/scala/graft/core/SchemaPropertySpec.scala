package graft.core

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure schema machinery (SURVEY §5.2: the
  * reference's payload grid generalized). */
class SchemaPropertySpec extends AnyFunSuite with graft.GenDriven {

  private val leafType: Gen[DataType] =
    Gen.oneOf(StringType, LongType, DoubleType, BooleanType, TimestampType)

  private def genSchema(depth: Int, width: Int): Gen[StructType] =
    Gen.listOfN(width,
      Gen.zip(Gen.identifier.map(_.take(6)),
        if (depth <= 0) leafType
        else Gen.frequency(
          3 -> leafType,
          1 -> Gen.lzy(genSchema(depth - 1, width)))))
      .map(fs => StructType(fs.distinctBy(_._1).map { case (n, t) => StructField(n, t) }))

  private def leafCount(s: StructType): Int = s.fields.map(_.dataType match {
    case st: StructType => leafCount(st)
    case _ => 1
  }).sum

  test("flattenSchema preserves leaf count and separates with __") {
    forAllSampled(genSchema(3, 4)) { s =>
      val flat = Flattener.flattenSchema(s)
      assert(flat.fields.forall(!_.dataType.isInstanceOf[StructType]))
      assert(flat.length === leafCount(s))
      // every flattened name decomposes into segments of the original path
      assert(flat.fieldNames.forall(_.split(Flattener.Sep).nonEmpty))
    }
  }

  test("mergeAddOnly is idempotent, monotone, and never mutates existing types") {
    forAllSampled(Gen.zip(genSchema(1, 4), genSchema(1, 4))) { case (a0, b0) =>
      val a = Flattener.flattenSchema(a0)
      val b = Flattener.flattenSchema(b0)
      val m1 = Inference.mergeAddOnly(a, b)
      // existing columns keep their exact type
      a.fields.foreach(f => assert(m1(f.name).dataType === f.dataType))
      // all incoming names present
      b.fieldNames.foreach(n => assert(m1.fieldNames.contains(n)))
      // idempotent
      assert(Inference.mergeAddOnly(m1, b).length === m1.length)
      // monotone: merging more never removes
      assert(m1.length >= a.length)
    }
  }

  test("array (and nested-array) element types survive the (type, format) codec") {
    val elem: Gen[DataType] =
      Gen.oneOf(StringType, LongType, DoubleType, BooleanType, TimestampType, FloatType)
    val arr: Gen[DataType] = Gen.oneOf(
      elem.map(ArrayType(_)),
      elem.map(e => ArrayType(ArrayType(e))))
    forAllSampled(arr) { dt =>
      val (jt, fmt) = Types.jsonTypeOf(dt)
      assert(jt === "array")
      assert(FieldDescriptor(jt, fmt).dataType === dt)
      // and through the full StructField metadata round-trip
      val f = FieldDescriptor(jt, fmt).toStructField("x")
      assert(f.dataType === dt)
      assert(Types.fromStructField(f).dataType === dt)
    }
    // legacy descriptors persisted before the codec carried element types
    assert(FieldDescriptor("array", None).dataType === ArrayType(StringType))
  }

  test("descriptor codec round-trips every flag combination") {
    val genDesc = for {
      jt <- Gen.oneOf("string", "integer", "number", "boolean")
      fmt <- Gen.oneOf(None, Some("date-time"), Some("double"), Some("float"), Some("uuid"))
      pk <- Gen.oneOf(true, false)
      part <- Gen.oneOf(true, false)
      req <- Gen.oneOf(true, false)
      idx <- Gen.oneOf(true, false)
    } yield FieldDescriptor(jt, fmt, pk, part, req, idx)
    forAllSampled(genDesc) { d =>
      assert(Types.fromStructField(d.toStructField("x")) === d)
    }
  }
}

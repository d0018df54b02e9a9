package graft.core

import org.apache.spark.sql.types._

/** Schema inference from values and add-only schema evolution.
  *
  * Reference semantics (moisturizer/models.py:8-15,91-96,138-153):
  *  - a field's type is inferred from the first value seen, with `bool`
  *    checked BEFORE `int` (insertion order of the mapping table matters);
  *  - `null` never infers or creates a column (nulls are stripped first,
  *    schemas.py:38-40);
  *  - evolution is add-only: only fields not yet in the descriptor are
  *    inferred and merged; an incompatible value for an EXISTING column is a
  *    per-row error (quarantine), never a widen (tests/test_models.py:65-83).
  */
object Inference {

  /** Infer a Spark type from a single JSON-ish scalar value, mirroring the
    * reference's isinstance-precedence (models.py:91-96): bool, int, float,
    * str, dict, list. Returns None for null (no inference from nulls). */
  def ofValue(v: Any): Option[DataType] = v match {
    case null                => None
    case _: Boolean          => Some(BooleanType)
    case _: Byte | _: Short | _: Int | _: Long => Some(LongType)
    case _: Float | _: Double => Some(DoubleType)
    case _: java.math.BigDecimal | _: BigDecimal => Some(DoubleType)
    case _: String           => Some(StringType)
    case _: Map[_, _]        => Some(StructType(Nil)) // object — flattened away upstream
    case _: Seq[_] | _: Array[_] => Some(ArrayType(StringType))
    case _                   => Some(StringType)
  }

  /** True when a value of type `incoming` can be stored in an existing column
    * of type `existing` without widening the column. The reference delegates
    * to colander coercion (schemas.py:9-28): ints fit number/float/double
    * columns, anything casts to string only if the COLUMN is a string. */
  def fits(existing: DataType, incoming: DataType): Boolean =
    (existing, incoming) match {
      case (a, b) if a == b                        => true
      case (StringType, _)                          => true // str() accepts all
      case (DoubleType | FloatType | _: DecimalType, LongType | IntegerType) => true
      case (DoubleType, FloatType)                  => true
      case (LongType, IntegerType | ShortType | ByteType) => true
      case (TimestampType | TimestampNTZType, StringType) => false // must parse per-row, handled by Validation
      case _                                        => false
    }

  /** Add-only merge of an incoming (inferred) schema into the registry
    * schema: fields new to the registry are appended with their inferred
    * type; existing fields keep their registered type unconditionally
    * (conflicts surface later as per-row quarantine, never as a widen).
    * Mirrors infer_schema_change (models.py:138-153). */
  def mergeAddOnly(registered: StructType, incoming: StructType): StructType = {
    val known = registered.fieldNames.toSet
    val added = incoming.fields.filterNot(f => known(f.name)).map { f =>
      // normalize inferred leaf types into the engine lattice
      val dt = normalize(f.dataType)
      val (jt, fmt) = Types.jsonTypeOf(dt)
      FieldDescriptor(jt, fmt).toStructField(f.name).copy(dataType = dt)
    }
    StructType(registered.fields ++ added)
  }

  /** Collapse Spark's JSON-inference output into the engine's type lattice:
    * integers → long, fractionals → double, bool/string kept, arrays kept
    * (SURVEY §7.6: strictly-more-capable than the ref's Text fallback),
    * structs kept (flattened before storage). */
  def normalize(dt: DataType): DataType = dt match {
    case IntegerType | ShortType | ByteType | LongType => LongType
    case FloatType | DoubleType | _: DecimalType       => DoubleType
    case BooleanType                                   => BooleanType
    case TimestampType                                 => TimestampType
    case TimestampNTZType                              => TimestampNTZType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = normalize(f.dataType))))
    case ArrayType(et, n) => ArrayType(normalize(et), n)
    case MapType(k, v, n) => MapType(normalize(k), normalize(v), n)
    case NullType                                      => StringType
    case other                                         => other
  }
}

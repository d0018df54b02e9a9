package graft.core

import org.apache.spark.sql.types._

/** Field descriptor — the engine's schema-registry unit.
  *
  * Mirrors the reference's `DescriptorFieldType` Cassandra UDT
  * (reference: moisturizer/models.py:83-108): a JSON-Schema `(type, format)`
  * pair plus key/index/required flags. The Spark encoding is a `StructField`
  * whose `Metadata` carries the flags, so a full table descriptor is simply a
  * `StructType` and rides Spark's native schema machinery (parquet footer,
  * catalog, `unionByName`) for free.
  */
final case class FieldDescriptor(
    jsonType: String,
    format: Option[String] = None,
    primaryKey: Boolean = false,
    partitionKey: Boolean = false,
    required: Boolean = false,
    index: Boolean = false) {

  /** JSON-Schema (type, format) → Spark DataType.
    * Mapping table from reference moisturizer/models.py:17-30 with the
    * SURVEY §1.2 / §7.6 decimal→double ruling for inferred numerics;
    * unknown pairs default to string (models.py:37,100-101).
    */
  def dataType: DataType = (jsonType, format) match {
    case ("string", Some("date-time")) => TimestampType
    case ("string", Some("uuid"))      => StringType
    case ("string", _)                 => StringType
    case ("number", Some("float"))     => FloatType
    case ("number", Some("double"))    => DoubleType
    case ("number", _)                 => DoubleType
    case ("integer", _)                => LongType
    case ("boolean", _)                => BooleanType
    case ("object", Some("descriptor")) => Types.descriptorMapType
    // arrays persist their ELEMENT type in `format` (catalogString encoding,
    // e.g. "bigint" / "array<double>") so a registry reload reconstructs the
    // exact live type — a bare ('array', null) descriptor (legacy rows)
    // falls back to array<string>
    case ("array", Some(fmt))          => ArrayType(Types.parseDataTypeString(fmt))
    case ("array", None)               => ArrayType(StringType)
    case _                             => StringType
  }

  def toStructField(name: String): StructField = {
    val mb = new MetadataBuilder()
      .putString(Types.KType, jsonType)
    format.foreach(mb.putString(Types.KFormat, _))
    if (primaryKey) mb.putBoolean(Types.KPrimaryKey, true)
    if (partitionKey) mb.putBoolean(Types.KPartitionKey, true)
    if (required) mb.putBoolean(Types.KRequired, true)
    if (index) mb.putBoolean(Types.KIndex, true)
    StructField(name, dataType, nullable = !required, metadata = mb.build())
  }
}

object Types {
  val KType = "graft.type"
  val KFormat = "graft.format"
  val KPrimaryKey = "graft.primary_key"
  val KPartitionKey = "graft.partition_key"
  val KRequired = "graft.required"
  val KIndex = "graft.index"

  /** The descriptors table's `properties` column type: map<field → descriptor
    * struct>, reference moisturizer/models.py:27-29,111-136. */
  val descriptorStructType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("format", StringType),
    StructField("primary_key", BooleanType),
    StructField("partition_key", BooleanType),
    StructField("required", BooleanType),
    StructField("index", BooleanType)))

  val descriptorMapType: MapType = MapType(StringType, descriptorStructType)

  /** Schema of the `descriptors` registry table itself (self-describing root,
    * reference moisturizer/__init__.py:35-42). */
  val descriptorsTableSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("last_modified", TimestampType),
    StructField("properties", descriptorMapType)))

  /** Spark DataType → (jsonType, format) — inverse of
    * FieldDescriptor.dataType for round-tripping registry rows. */
  def jsonTypeOf(dt: DataType): (String, Option[String]) = dt match {
    case StringType     => ("string", None)
    case TimestampType | TimestampNTZType => ("string", Some("date-time"))
    case DateType       => ("string", Some("date-time"))
    case FloatType      => ("number", Some("float"))
    case DoubleType     => ("number", Some("double"))
    case _: DecimalType => ("number", None)
    case LongType | IntegerType | ShortType | ByteType => ("integer", None)
    case BooleanType    => ("boolean", None)
    case _: MapType     => ("object", Some("descriptor"))
    case _: StructType  => ("object", None)
    case a: ArrayType   => ("array", Some(a.elementType.catalogString))
    case _              => ("string", None)
  }

  /** Parse a DataType persisted as a descriptor `format` string (the
    * catalogString/DDL encoding written by [[jsonTypeOf]]). Unknown strings
    * degrade to string — a registry load must never fail on one field. */
  def parseDataTypeString(s: String): DataType =
    try DataType.fromDDL(s) catch { case _: Exception => StringType }

  def fromStructField(f: StructField): FieldDescriptor = {
    val m = f.metadata
    def flag(k: String): Boolean = m.contains(k) && m.getBoolean(k)
    val (jt, fmtDefault) =
      if (m.contains(KType))
        (m.getString(KType),
         if (m.contains(KFormat)) Some(m.getString(KFormat)) else None)
      else jsonTypeOf(f.dataType)
    FieldDescriptor(jt, fmtDefault,
      primaryKey = flag(KPrimaryKey), partitionKey = flag(KPartitionKey),
      required = flag(KRequired), index = flag(KIndex))
  }

  /** Every table implicitly carries `id` (string, pk+partition) and
    * `last_modified` (timestamp, indexed) — reference models.py:53-56,127-136. */
  val idField: StructField =
    FieldDescriptor("string", Some("uuid"), primaryKey = true,
      partitionKey = true).toStructField("id")
  val lastModifiedField: StructField =
    FieldDescriptor("string", Some("date-time"), index = true)
      .toStructField("last_modified")

  /** Inject the implicit meta fields if absent (set_default_properties,
    * reference models.py:127-136). Meta fields lead, rest keep order. */
  def withMetaFields(schema: StructType): StructType = {
    val rest = schema.fields.filterNot(f => f.name == "id" || f.name == "last_modified")
    val id = schema.fields.find(_.name == "id").getOrElse(idField)
    val lm = schema.fields.find(_.name == "last_modified").getOrElse(lastModifiedField)
    StructType(id +: lm +: rest)
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** The descriptor registry: one row per type, persisted as a parquet table
  * and cached on the driver.
  *
  * Reference: `DescriptorModel` (moisturizer/models.py:111-174) persisted in
  * Cassandra, plus the consumer's driver-side dict cache
  * (moisturizer/consumer.py:15,41-55). The registry is self-describing — its
  * own schema is a row in itself (reference __init__.py:35-42).
  *
  * Scale notes: descriptor reads/writes are METADATA operations — tiny
  * DataFrames that never touch executor-scale data. The driver cache makes
  * the per-batch lookup O(1) (exactly the reference's cache), and the
  * persisted table is the restart-recovery source of truth. At 1000-executor
  * scale the registry stays driver-small (one row per *type*, not per row of
  * data).
  */
final class SchemaRegistry(spark: SparkSession, val warehouseDir: String,
                           immutableSchema: Boolean = false) {

  private val cache = TrieMap.empty[String, StructType]

  private def descriptorsPath = s"$warehouseDir/descriptors"
  def tablePath(typeId: String): String = s"$warehouseDir/tables/$typeId"

  /** Bootstrap: create the descriptors table seeded with its own descriptor
    * (self-describing root, reference __init__.py:20-42). Idempotent. */
  def bootstrap(): Unit = {
    if (!new java.io.File(descriptorsPath).exists()) {
      val self = Types.descriptorsTableSchema
      writeDescriptor("descriptor_model", self)
    }
    loadAll()
  }

  private def loadAll(): Unit =
    if (new java.io.File(descriptorsPath).exists()) {
      spark.read.parquet(descriptorsPath).collect().foreach { row =>
        cache.put(row.getString(0), schemaOfRow(row))
      }
    }

  private def schemaOfRow(row: Row): StructType = {
    val props = row.getMap[String, Row](2)
    val fields = props.toSeq.sortBy(_._1).map { case (name, d) =>
      FieldDescriptor(
        jsonType = d.getString(0),
        format = Option(d.getString(1)),
        primaryKey = Option(d.getBoolean(2)).getOrElse(false),
        partitionKey = Option(d.getBoolean(3)).getOrElse(false),
        required = Option(d.getBoolean(4)).getOrElse(false),
        index = Option(d.getBoolean(5)).getOrElse(false)).toStructField(name)
    }
    // meta fields first, matching withMetaFields ordering
    Types.withMetaFields(StructType(fields))
  }

  /** Serialize a StructType to a descriptors-table row and upsert it.
    * Synchronized: concurrent per-type ingest threads (Ingest parallelism)
    * must not interleave the read-modify-write of the descriptors table. */
  private def writeDescriptor(typeId: String, schema: StructType): Unit = synchronized {
    val props: Map[String, Row] = schema.fields.map { f =>
      val d = Types.fromStructField(f)
      f.name -> Row(d.jsonType, d.format.orNull, d.primaryKey, d.partitionKey,
        d.required, d.index)
    }.toMap
    val row = Row(typeId, java.sql.Timestamp.from(java.time.Instant.now()), props)
    val df = spark.createDataFrame(
      java.util.List.of(row), Types.descriptorsTableSchema)
    val existing =
      if (new java.io.File(descriptorsPath).exists())
        spark.read.parquet(descriptorsPath).filter(col("id") =!= typeId)
      else spark.createDataFrame(java.util.List.of[Row](), Types.descriptorsTableSchema)
    val merged = existing.unionByName(df).cache()
    merged.count() // materialize before overwrite of a path we just read
    merged.coalesce(1).write.mode("overwrite").parquet(descriptorsPath + ".tmp")
    merged.unpersist()
    val tmp = new java.io.File(descriptorsPath + ".tmp")
    val dst = new java.io.File(descriptorsPath)
    if (dst.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(dst) }
    tmp.renameTo(dst)
  }

  /** Descriptor lookup with create-if-missing (reference consumer.py:41-55,
    * models.py:155-166): cache → table → create empty (meta fields only). */
  def getOrCreate(typeId: String): StructType =
    cache.getOrElseUpdate(typeId, {
      if (immutableSchema)
        throw new IllegalStateException(
          s"immutable_schema: unknown type '$typeId'") // reference __init__.py:68-74
      val schema = Types.withMetaFields(StructType(Nil))
      writeDescriptor(typeId, schema)
      schema
    })

  def get(typeId: String): Option[StructType] = cache.get(typeId)
  def knownTypes: Seq[String] = cache.keys.toSeq.sorted

  /** Add-only evolution (reference models.py:138-153): merge newly-inferred
    * fields into the registered schema, persist, refresh cache. No-op when
    * nothing is new or the registry is immutable. */
  def evolve(typeId: String, incoming: StructType): StructType = synchronized {
    val current = getOrCreate(typeId)
    val merged = Inference.mergeAddOnly(current, incoming)
    if (merged.length != current.length) {
      if (immutableSchema)
        throw new IllegalStateException(
          s"immutable_schema: cannot evolve '$typeId'")
      writeDescriptor(typeId, merged)
      cache.put(typeId, merged)
    }
    merged
  }

  /** Drop a type: delete its descriptor row and physical table
    * (reference models.py:176-182). */
  def drop(typeId: String): Unit = {
    cache.remove(typeId)
    val existing =
      if (new java.io.File(descriptorsPath).exists())
        spark.read.parquet(descriptorsPath).filter(col("id") =!= typeId).cache()
      else null
    if (existing != null) {
      existing.count()
      existing.coalesce(1).write.mode("overwrite").parquet(descriptorsPath + ".tmp")
      existing.unpersist()
      val tmp = new java.io.File(descriptorsPath + ".tmp")
      val dst = new java.io.File(descriptorsPath)
      org.apache.commons.io.FileUtils.deleteDirectory(dst)
      tmp.renameTo(dst)
    }
    val t = new java.io.File(tablePath(typeId))
    if (t.exists()) org.apache.commons.io.FileUtils.deleteDirectory(t)
  }

  /** The descriptors table as a DataFrame (for catalog queries). */
  def descriptorsDf: DataFrame = spark.read.parquet(descriptorsPath)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns with typed metadata structs; decode / feature-extraction runs as
  * a partition-wise batch transform (`mapPartitions` over Rows — the Scala
  * analog of `mapInPandas` batch UDFs: one decoder init per partition, rows
  * streamed through it).
  *
  * The container has no image/audio codecs, so the decode step is a STUB —
  * `decodeStub` derives deterministic fake features from the bytes. The
  * Spark-side plumbing (schema, batch shape, partitioning, null handling) is
  * real and tested; swap `decodeStub` for a real codec on a cluster.
  */
object MultimodalOps {

  /** Typed metadata carried next to the payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Wrap a binary column with its metadata struct (pure expressions). */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(binCol)).cast(LongType).as("n_bytes"),
      md5(col(binCol)).as("digest")))

  /** Feature row produced by the decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUBBED decoder: deterministic fake decode of a media payload.
    * A real deployment replaces this body with an image/audio codec call;
    * the signature (bytes in, fixed-schema features out) is the contract. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, 0, Array.empty[Float])
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + (math.abs(h) % 64)
    val height = 16 + (math.abs(h >> 8) % 64)
    val nFrames = 1 + (math.abs(h >> 16) % 8)
    // deterministic 8-dim "feature" from byte statistics
    val feat = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc += (bytes(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000f
    }
    (width, height, nFrames, feat)
  }

  /** Partition-wise decode: the mapInPandas-shaped batch transform. Keeps
    * the id column, emits decoded feature columns. One decoder "session"
    * per partition (the `it =>` closure), rows streamed — the exact shape a
    * real GPU/codec pipeline needs for amortized init. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     binCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, df.schema(idCol).dataType) +: featureSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { row =>
        val bytes = if (row.isNullAt(binIdx)) null else row.getAs[Array[Byte]](binIdx)
        val (w, h, nf, feat) = decodeStub(bytes)
        Row(row.get(idIdx), w, h, nf, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling plan for a video payload: every
    * `stride`-th frame index — pure expressions, no decode needed. */
  def frameSamplePlan(nFrames: org.apache.spark.sql.Column, stride: Int) =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))

  /** STUBBED resize: average-pool a feature array to `targetDims` — the
    * stand-in for an image/audio resample. Deterministic, boundary-exact
    * (each output cell averages its ⌊n/target⌋..⌈⌉ source slice). */
  def resizeStub(feat: Seq[Float], targetDims: Int): Array[Float] = {
    if (feat == null || feat.isEmpty || targetDims <= 0) return Array.empty
    val n = feat.length
    Array.tabulate(targetDims) { i =>
      val lo = (i.toLong * n / targetDims).toInt
      val hi = math.max(lo + 1, ((i + 1).toLong * n / targetDims).toInt)
      var acc = 0.0
      var j = lo
      while (j < hi) { acc += feat(j); j += 1 }
      (acc / (hi - lo)).toFloat
    }
  }

  /** Partition-wise resize over a decoded-feature frame — the second stage
    * of the decode → resize pipeline, same batch shape as
    * [[decodeFeatures]] (one resampler init per partition, rows streamed)
    * so chained media stages compose without re-shuffling. */
  def resizeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     featCol: String, targetDims: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("feature_resized", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val featIdx = df.schema.fieldIndex(featCol)
    val rdd = df.rdd.mapPartitions { it =>
      // resampler init would happen here, once per partition
      it.map { row =>
        val feat = if (row.isNullAt(featIdx)) null else row.getSeq[Float](featIdx)
        Row(row.get(idIdx), resizeStub(feat, targetDims).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

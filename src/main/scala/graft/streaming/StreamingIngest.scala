package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Engine
import graft.sources.Codecs

/** Structured-Streaming front end for the ingestion engine.
  *
  * Reference: the Kafka consumer loop (moisturizer/consumer.py:72-83) —
  * subscribe N topics in a consumer group, decode each message, commit it,
  * swallow per-message failures and keep going (at-least-once).
  *
  * Spark shape: `readStream` → `foreachBatch` running the SAME batch
  * pipeline as [[graft.core.Ingest]]. `foreachBatch` is required (not a
  * declarative sink) because the reference picks the SINK per row — the
  * `type_id` decides which table a message lands in, and the schema registry
  * may evolve between batches; both are driver-side decisions Structured
  * Streaming cannot express in a single fixed-schema sink (SURVEY §2.B).
  *
  * Delivery: per-batch appends + LWW read view ⇒ re-processed batches
  * (at-least-once replay after failure) converge to the same serving state —
  * the same idempotence Cassandra upserts gave the reference.
  */
object StreamingIngest {

  /** Kafka envelope stream (requires the spark-sql-kafka connector on the
    * classpath — present on real clusters; absent in this container, where
    * specs use file/memory sources through [[start]] instead).
    * Mirrors consumer config: topics + group (reference config.py:8-10). */
  def fromKafka(spark: SparkSession, bootstrapServers: String,
                topics: Seq[String], groupId: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "earliest")
      .load()
      // value: binary msgpack-or-json, exactly the reference's input bytes
      .select(Codecs.decodeMessageUdf(col("value")).as("message"))

  /** Run the engine over any streaming DataFrame bearing a `message` column
    * (JSON envelope). Each micro-batch runs the full batch pipeline:
    * decode → per-type infer/validate/flatten/evolve → append.
    *
    * `writer`/`grants` thread the S24 write-side 403 gate into the
    * consumer loop (VERDICT r19 #3 — streaming parity with
    * [[Engine.Handle.ingestAs]]): when set, each micro-batch runs the
    * write-gated ingest, so a denied type's envelopes arriving mid-stream
    * land in that type's quarantine with the structured 403 error and the
    * stream KEEPS GOING (continue-on-deny = the dead-letter doctrine the
    * reference's consumer already applies to poison messages). The grants
    * frame is collected per batch at metadata scale (one row per
    * (user, type) pair) — a production loop re-reads it so revocations
    * take effect on the next batch, not at restart. */
  def start(h: Engine.Handle, envelopes: DataFrame, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            writer: Option[String] = None,
            grants: Option[DataFrame] = None): StreamingQuery = {
    // fail at start, not inside the per-batch catch (which would silently
    // skip every batch): a gated stream without grants is a config error
    require(writer.isEmpty || grants.nonEmpty,
      "start(writer = ...) requires the grants frame")
    envelopes.writeStream
      .queryName("graft-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // per-batch failure isolation (reference consumer.py:78-83): a
        // poison batch logs and is skipped; good rows in it were already
        // split out by the pipeline's quarantine routing
        try writer match {
          case Some(u) => h.ingestAs(u, grants.get, batch)
          case None => h.ingest(batch)
        }
        catch {
          case e: Exception =>
            System.err.println(s"[graft-ingest] batch $batchId failed: ${e.getMessage}")
        }
        ()
      }
      .start()
  }

  /** [[start]] plus post-batch maintenance: after each micro-batch, any
    * type whose physical file count crossed `maxFilesPerType` is compacted
    * (LWW-collapse + crash-safe dir swap). The small-files control loop a
    * long-running streaming ingest needs — the check is one directory
    * listing per type, so idle batches cost only metadata. */
  def startWithMaintenance(h: Engine.Handle, envelopes: DataFrame,
                           checkpointDir: String, maxFilesPerType: Int = 64,
                           trigger: Trigger = Trigger.AvailableNow(),
                           writer: Option[String] = None,
                           grants: Option[DataFrame] = None): StreamingQuery = {
    require(writer.isEmpty || grants.nonEmpty,
      "startWithMaintenance(writer = ...) requires the grants frame")
    envelopes.writeStream
      .queryName("graft-ingest-maint")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try {
          writer match {
            case Some(u) => h.ingestAs(u, grants.get, batch)
            case None => h.ingest(batch)
          }
          h.registry.knownTypes.filterNot(_ == "descriptor_model")
            .foreach(t => h.compactIfNeeded(t, maxFilesPerType))
        } catch {
          case e: Exception =>
            System.err.println(s"[graft-ingest] batch $batchId failed: ${e.getMessage}")
        }
        ()
      }
      .start()
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Codecs

/** The batch ingestion pipeline — the reference's main path re-expressed for
  * Spark (moisturizer/consumer.py:57-70, traced in SURVEY §3.1):
  *
  *   decode → envelope → per-type { infer → validate/coerce → flatten →
  *   evolve registry → defaults → append write }
  *
  * Stage order matters and matches the reference: inference sees the
  * flattened, null-stripped, coerced payload, so nested objects contribute
  * leaf columns and nulls never create columns.
  *
  * Scale notes: the fan-out is per-TYPE (bounded, driver-side loop exactly
  * like the reference's table-per-type design); per-type work is fully
  * distributed (JSON parse, flatten projection, try_cast validation are all
  * codegen'd executor work; no driver collect of data rows). Appends are
  * write-once parquet — the LWW view resolves upserts at read, compaction
  * collapses the log (Upserts.compact).
  */
object Ingest {

  final case class Report(
      perType: Map[String, Long],
      deadLetters: Long,
      quarantined: Long)

  /** Ingest a batch of raw messages (JSON or MsgPack bytes rendered to JSON
    * strings already, e.g. by Codecs.decodeMessageUdf).
    *
    * @param envelopes DataFrame with a string column `message` holding the
    *                  decoded JSON envelope `{type_id, data}`.
    * @param ingestTime logical write time for `last_modified` defaulting —
    *                   injectable for deterministic tests (reference default
    *                   is now(); models.py:55-56).
    */
  def ingest(registry: SchemaRegistry,
             envelopes: DataFrame, messageCol: String = "message",
             ingestTime: Option[java.sql.Timestamp] = None,
             writer: Option[String] = None,
             grants: Option[DataFrame] = None): Report = {
    // Bind to the session the batch's actions will actually EXECUTE on:
    // inside foreachBatch the frame belongs to the micro-batch clone, not
    // the caller's parent session — a WriteCounts listener registered on
    // the parent never sees the clone's write commands, silently forcing
    // the fallback count job every single micro-batch.
    val spark = envelopes.sparkSession
    import spark.implicits._

    // Reference processes messages one-by-one; the batch equivalent groups
    // by type. Types are bounded (table-per-type), so driver iteration over
    // the distinct set is metadata-scale, not data-scale. ONE aggregation
    // pass yields both the dead-letter count (null type_id group) and the
    // type fan-out list.
    val cached = Codecs.unwrapAll(envelopes, messageCol)
      .select("type_id", "data_json").cache()
    try {
      // the fan-out agg also flags ARRAY payloads per type: a top-level
      // JSON-array `data` parses to one row PER ELEMENT downstream, which
      // breaks the row-preserving assumption the arithmetic quarantine
      // count rests on — such types take the counted fallback. The same
      // pass collects each type's SHAPE-SIGNATURE set (graft_json_shape —
      // the sound inference cache key; see plans/JsonShape.scala): a batch
      // whose signature set was seen before skips the spark.read.json
      // inference scan entirely, the dominant per-batch fixed cost.
      val typeCounts = cached.groupBy("type_id").agg(
        count(lit(1)).as("n"),
        sum(when(ltrim($"data_json").startsWith("["), 1L).otherwise(0L))
          .as("n_array"),
        collect_set(graft.plans.JsonShape.shapeSig($"data_json")).as("sigs"))
        .collect()
      val deadLetters = typeCounts.filter(_.isNullAt(0)).map(_.getLong(1)).sum
      val types = typeCounts.filter(!_.isNullAt(0)).map(_.getString(0)).sorted

      // S24 WRITE-side gate (tests/test_views.py:79-118): when the batch
      // carries a writer identity, each type's admit/deny decides DRIVER-
      // side over the already-collected fan-out list (metadata scale —
      // zero extra distributed work). Denied types' rows route to that
      // type's quarantine with the structured 403 error
      // (Permissions.writeDecision = the one semantic definition) and
      // ingest CONTINUES for the rest of the batch — the dead-letter
      // continue-on-error doctrine applied to authorization.
      val typeRowCounts = typeCounts.filter(!_.isNullAt(0))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val denied: Map[String, String] = writer match {
        case Some(u) =>
          val g = grants.getOrElse(throw new IllegalArgumentException(
            "ingest(writer = ...) requires the grants frame"))
          // duplicate (user, type) grant rows collapse by OR — the same
          // any-granting-row-admits rule classifyWrites aggregates with,
          // so the two paths stay equal on every input (r19 review: a
          // plain .toMap was nondeterministic last-wins under collect
          // partition order)
          val gm = g.filter(col("user_id") === u)
            .select("type_id", "can_create", "can_write").collect()
            .groupBy(_.getString(0)).map { case (t, rows) =>
              t -> (
                rows.exists(r => !r.isNullAt(1) && r.getBoolean(1)),
                rows.exists(r => !r.isNullAt(2) && r.getBoolean(2)))
            }
          types.flatMap(t => graft.operators.Permissions
            .writeDecision(gm.get(t), registry.knownTypes.contains(t))
            .map(t -> _)).toMap
        case None => Map.empty
      }
      // each denied type quarantines to its OWN table, so the writes stay
      // per-type — but they fan out concurrently on the ingest pool like
      // the admitted path below (VERDICT r19 #5: a mass-deny batch must
      // not pay one SEQUENTIAL driver-blocked job per denied type)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = Ingest.ingestPool
      if (denied.nonEmpty) {
        val denyFutures = denied.toSeq.sortBy(_._1).map { case (t, code) =>
          Future {
            Validation.quarantineRecords(
                cached.filter($"type_id" === t).select("data_json"),
                errno = 403, error = code,
                message = s"user '${writer.get}' may not ${
                  if (code == "CreateForbidden") "create" else "write"} type '$t'")
              .withColumn("type_id", lit(t))
              .write.mode("append").option(NoJobMarker._1, NoJobMarker._2)
              .parquet(registry.quarantinePath(t))
          }
        }
        Await.result(Future.sequence(denyFutures), Duration.Inf)
      }
      val admitted = types.filterNot(denied.contains)
      // Types are independent (separate tables, separate registry rows with
      // locked mutations) — fan their sub-batches out concurrently; Spark's
      // scheduler interleaves the jobs. Mirrors a real cluster where a
      // driver loop over types would serialize executor idle time.
      val subTotals = typeCounts.filter(!_.isNullAt(0))
        .map(r => r.getString(0) ->
          (if (r.getLong(2) == 0L) Some(r.getLong(1)) else None)).toMap
      // a type's batch is cacheable iff every row produced a sound shape
      // signature (no bail sentinel) and the shape set is small — then the
      // sorted set IS the cache key
      val shapeSigs = typeCounts.filter(!_.isNullAt(0))
        .map { r =>
          val sigs = r.getSeq[String](3)
          r.getString(0) -> (
            if (sigs.contains(graft.plans.JsonShape.Bail) || sigs.size > 64)
              None
            else Some(sigs.sorted.mkString("\n")))
        }.toMap
      val futures = admitted.toSeq.map { typeId =>
        Future {
          val payloads: Dataset[String] =
            cached.filter($"type_id" === typeId).select("data_json").as[String]
          typeId -> ingestType(spark, registry, typeId, payloads, ingestTime,
            subTotal = subTotals(typeId), shapeSig = shapeSigs(typeId))
        }
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      Report(
        results.map { case (t, (n, _)) => t -> n }.toMap,
        deadLetters,
        results.map(_._2._2).sum +
          denied.keysIterator.map(typeRowCounts).sum)
    } finally cached.unpersist()
  }

  /** Bounded pool for per-type ingest concurrency (driver-side job
    * submission only; the heavy lifting stays on executors). Daemon threads:
    * the pool must never block JVM exit. */
  private lazy val ingestPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "graft-ingest")
        t.setDaemon(true)
        t
      }))

  /** Exact row counts of V1 file writes, captured from the write command's
    * own `numOutputRows` SQL metric (BasicWriteJobStatsTracker aggregates
    * COMMITTED task stats only — the number the Spark UI shows for the
    * write; no stage-retry double counting, unlike the executor-level
    * `recordsWritten` task metric). Lets ingest report the written count
    * without a separate count job per batch: the listener records every
    * InsertIntoHadoopFsRelationCommand's (outputPath → rows), and the
    * writer drains the listener bus before reading its path's entry. A
    * missing entry falls back to an exact count over the still-cached
    * frame — the capture is an optimization, never a correctness input. */
  private object WriteCounts {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.command.DataWritingCommandExec
    import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
    import org.apache.spark.sql.util.QueryExecutionListener

    // every expectation carries a unique token: a late onSuccess arriving
    // AFTER its take() timed out records (token, rows) for an expectation
    // that no longer exists, and a LATER take() for the same path must not
    // mistake that stale entry for its own write — the previous write's
    // count would corrupt n and the quarantine arithmetic. take() accepts
    // an entry only when the recorded token is its own.
    private final case class Capture(token: Long, rows: Long)
    private val tokens = new java.util.concurrent.atomic.AtomicLong(0L)
    private val byPath =
      new java.util.concurrent.ConcurrentHashMap[String, Capture]()
    // only paths a writer DECLARED interest in are recorded — without this
    // gate every parquet write in the process (quarantine, streaming
    // state, bench artifacts, scratch dirs) would grow byPath forever
    private val expected =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private val sessions = java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        // V1 file writes run under AQE in Spark 4: qe.executedPlan's root
        // is AdaptiveSparkPlanExec and the executed tree hides behind
        // leaf-like wrappers (AdaptiveSparkPlanExec.executedPlan,
        // QueryStageExec.plan) whose `children` is empty — a plain
        // collect over qe.executedPlan sees only the wrapper and the
        // command match silently never fires. Recurse through the
        // wrappers; the PHYSICAL DataWritingCommandExec's command
        // instance carries the task-committed numOutputRows metric (the
        // logical plan's command is a planning-time copy whose metric
        // stays 0 — reading it would capture the wrong count).
        def visit(p: org.apache.spark.sql.execution.SparkPlan): Unit =
          p.foreach {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              visit(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              visit(q.plan)
            case w: DataWritingCommandExec => w.cmd match {
              case i: InsertIntoHadoopFsRelationCommand =>
                val key = norm(qe.sparkSession, i.outputPath.toString)
                val tok = expected.get(key)
                if (tok != null)
                  w.cmd.metrics.get("numOutputRows").foreach(m =>
                    byPath.put(key, Capture(tok.longValue(), m.value)))
              case _ =>
            }
            case _ =>
          }
        visit(qe.executedPlan)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }

    /** Fully-qualified (scheme + authority + path) key via the path's own
      * FileSystem — scheme-less normalization collided across filesystems
      * (file:/x vs hdfs:/x). Qualification resolves the caller's string
      * and the command's outputPath to the same canonical form. */
    private def norm(spark: SparkSession, path: String): String = {
      val u = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(path)).toUri
      // URI.toString is NOT canonical across empty-vs-null authority
      // ("file:///tmp/x" vs "file:/tmp/x" name the same file but compare
      // unequal) — the command's outputPath and the caller's string can
      // arrive in either form. Rebuild from parts with the authority
      // normalized away when absent/empty.
      val auth = Option(u.getAuthority).filter(_.nonEmpty)
      u.getScheme + auth.map("://" + _).getOrElse(":") + u.getPath
    }

    /** Register the listener (once per session), declare interest in
      * `path`'s next write, and return the expectation token to pass to
      * [[take]]. Call BEFORE the write. */
    def expect(spark: SparkSession, path: String): Long = {
      sessions.synchronized {
        if (sessions.add(spark)) spark.listenerManager.register(listener)
      }
      val tok = tokens.incrementAndGet()
      expected.put(norm(spark, path), tok)
      tok
    }

    /** Drain the async listener bus, then take this path's captured count
      * — accepted only if it was recorded for THIS expectation (`token`).
      * Any failure here (e.g. waitUntilEmpty's TimeoutException on a
      * backlogged shared bus) degrades to None — the capture is an
      * optimization; the caller's cached count is the correctness path. */
    def take(spark: SparkSession, path: String, token: Long): Option[Long] = {
      val p = norm(spark, path)
      try org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext, 2000L)
      catch { case _: Exception => }
      finally expected.remove(p, java.lang.Long.valueOf(token))
      val c = byPath.get(p)
      if (c == null) None
      else if (c.token == token) { byPath.remove(p, c); Some(c.rows) }
      // another (newer, still-live) expectation's capture for the same
      // path — leave it for its owner (ADVICE r12: removing it forced the
      // concurrent writer into a full recount); listener overwrite on the
      // next capture bounds growth, so a truly stale entry is harmless
      else None
    }
  }

  /** Inference cache: (typeId + " " + batch shape-signature set) → the
    * schema `spark.read.json` inferred for that exact shape set. Sound
    * because the signature determines the inferred schema (see
    * plans/JsonShape.scala); process-global because the key is pure batch
    * content — registry state, session, and warehouse never enter it. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Observable hit/miss counters so the skip-the-inference-scan claim is
    * a spec assertion (InferenceSigSpec), not prose. Monotonic,
    * process-global, test-read-only. */
  val schemaCacheHits = new java.util.concurrent.atomic.AtomicLong(0L)
  val schemaCacheMisses = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Batch epoch in µs since the Unix epoch — one value per sub-batch,
    * strictly increasing across successive batches (guarded by a monotonic
    * floor so clock granularity can never hand two batches the same epoch). */
  private val lastEpoch = new java.util.concurrent.atomic.AtomicLong(0L)
  private def batchEpochMicros(): Long = {
    val now = java.time.Instant.now()
    val micros = now.getEpochSecond * 1000000L + now.getNano / 1000L
    lastEpoch.updateAndGet(prev => math.max(prev + 1, micros))
  }

  /** Physical layout: per-type tables are partitioned by a stable hash
    * bucket of the primary key, the Spark-native analog of the reference's
    * Cassandra partition_key (models.py:87,131-132). All versions of an id
    * land in one bucket, so point lookups read 1/NumIdBuckets of the files
    * (partition pruning) and the LWW view over a single id stays correct. */
  val NumIdBuckets = 16
  def idBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(NumIdBuckets))

  /** Sub-batches at or under this row count append into the L0 zone
    * (`_part=-1`): ONE file through one write task, no exchange, 1 commit —
    * the LSM delta-file pattern. A micro-batch-scale append that writes
    * every one of the 16 bucket files pays ~16× per-file parquet writer
    * init + commit for a few KB of data (measured: 0.42 s vs 0.15 s for
    * the same rows as one file); at 100 TB append rates that 16× write
    * amplification is the small-files problem itself. Compaction folds L0
    * into the real buckets ([[graft.core.Engine.Handle.compact]] recomputes
    * `_part`), so the bucketed zone holds ~all data and L0 stays bounded by
    * the maintenance cadence. Point lookups prune to {idBucket(id), L0} —
    * two partitions, the second one small by construction. Above the
    * threshold the append shuffles into NumIdBuckets parallel writers
    * directly. */
  val SmallAppendRows = 100000L

  /** L0 partition value — outside idBucket's [0, NumIdBuckets) range. */
  val L0Bucket = -1L

  /** Delete-tombstone marker column (ingest-meta, like `_ingest_epoch`):
    * a log row with `_deleted = true` records that its id was DELETED at
    * its `last_modified`/epoch position in the LWW order. The append-log
    * analog of Delta's delete markers / Cassandra's tombstones (which is
    * where the reference's deletes actually live — Cassandra writes a
    * tombstone for DELETE, tests/test_views.py:234-241): serving views
    * drop ids whose LWW winner is a tombstone, [[graft.core.Engine.Handle.compact]]
    * RETAINS winning tombstones (so a late-arriving write with an older
    * `last_modified` still loses after any number of compactions), and
    * `vacuum(horizon)` ages them out — the gc_grace_seconds trade: the
    * horizon must trail the maximum accepted write lateness, or an aged
    * tombstone lets an older late write resurrect the row. */
  val DeletedCol = "_deleted"

  /** Append delete tombstones for the ids in `doomed` (any column named
    * `id`, cast to the registered string key). One tombstone row per id:
    * the key, `last_modified = deleteTime` (the position the delete takes
    * in the LWW order — later writes win over it, older ones lose),
    * `_deleted = true`, and the batch epoch/seq stamps every ingest write
    * carries. Size-aware like [[ingestType]]'s append: metadata-scale
    * deletes land as ONE L0 file (no exchange), bulk deletes shuffle into
    * the bucketed layout. Returns the tombstone count. */
  def appendTombstones(spark: SparkSession, registry: SchemaRegistry,
                       typeId: String, doomed: DataFrame,
                       deleteTime: java.sql.Timestamp): Long = {
    val tablePath = registry.tablePath(typeId)
    val tpath = new org.apache.hadoop.fs.Path(tablePath)
    val hfs = tpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(hfs.exists(tpath),
      s"delete from '$typeId': table does not exist")
    val rows = doomed.select(col("id").cast(StringType).as("id")).distinct()
      .withColumn("last_modified", lit(deleteTime))
      .withColumn(DeletedCol, lit(true))
      .withColumn("_ingest_epoch", lit(batchEpochMicros()))
      .withColumn("_ingest_seq", monotonically_increasing_id())
      .cache()
    try {
      val n = rows.count()
      val smallAppend = n <= SmallAppendRows
      val partCol = if (smallAppend) lit(L0Bucket) else idBucket(col("id"))
      val written = rows.withColumn("_part", partCol)
      registry.withTableLock(typeId) {
        (if (smallAppend) written.coalesce(1)
         else written.repartition(NumIdBuckets, col("_part")))
          .write.mode("append").partitionBy("_part")
          .option(NoJobMarker._1, NoJobMarker._2)
          .parquet(tablePath)
      }
      n
    } finally rows.unpersist()
  }

  /** Writer option that suppresses the per-job `_SUCCESS` marker on the
    * engine's OWN table/state writes. The engine's visibility contract is
    * the table lock + WriteCounts (and streaming's checkpoint commit log),
    * never the marker — but every micro-batch append pays the marker's
    * file create (plus its checksum shadow on local FS). External
    * consumers that want markers read the tables through their own session
    * conf; the engine's internal write paths don't need them. */
  val NoJobMarker: (String, String) =
    "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false"

  /** One type's sub-batch: returns (written, quarantined).
    *
    * @param subTotal the sub-batch's row count when the caller already has
    *        it (the type fan-out agg does) — lets the quarantine COUNT be
    *        derived arithmetically (total − corrupt − written; validate is
    *        an exact two-way split with never-null predicates) instead of
    *        paying a second full parse→flatten→validate pass per batch.
    *        The quarantine WRITE still runs, but only when that count > 0.
    *        MUST be None when any payload is a top-level JSON array — the
    *        parse then yields one row per ELEMENT and the arithmetic no
    *        longer holds (the caller's fan-out agg detects this). */
  def ingestType(spark: SparkSession, registry: SchemaRegistry, typeId: String,
                 payloads: Dataset[String],
                 ingestTime: Option[java.sql.Timestamp],
                 subTotal: Option[Long] = None,
                 shapeSig: Option[String] = None): (Long, Long) = {
    // 1. Parse + infer (schema-on-read): Spark's JSON inference plays the
    //    role of DescriptorFieldType.from_value over the whole sub-batch
    //    (reference models.py:91-96 per message; batching is the idiomatic
    //    Spark equivalent — SURVEY §2.A S8).
    // dropFieldIfAllNull: nulls never create columns (schemas.py:38-40)
    //
    // INFERENCE CACHE: the inferred schema is a pure function of the
    // batch's shape-signature set (plans/JsonShape.scala has the soundness
    // argument), so a (type, signature) hit replaces the inference scan
    // with the remembered schema — same parse code path, same schema,
    // bit-identical rows. Steady-state batches of a known shape (the
    // production common case, and every repeat engine/bench run) skip the
    // dominant per-batch job. No invalidation is ever needed: the key is
    // batch content, not registry state.
    val cacheKey = shapeSig.map(sig => typeId + "\u0000" + sig)
    val cachedSchema = cacheKey.flatMap(k => Option(schemaCache.get(k)))
    val parsed0 = cachedSchema match {
      case Some(known) =>
        schemaCacheHits.incrementAndGet()
        // empty remembered schema = all-{} batch: any empty-schema frame
        // routes through the `parsed0.schema.isEmpty` branch below, which
        // rebuilds the row-preserving 0-column frame from payloads
        if (known.isEmpty) spark.emptyDataFrame
        else spark.read.schema(known).json(payloads)
      case None =>
        schemaCacheMisses.incrementAndGet()
        val p = spark.read.option("dropFieldIfAllNull", "true").json(payloads)
        cacheKey.foreach { k =>
          if (schemaCache.size > 512) schemaCache.clear() // crude LRU bound
          schemaCache.put(k, p.schema)
        }
        p
    }
    // empty payloads ({} / null data) still become rows with meta defaults
    // (reference writes a row with only id/last_modified, consumer.py:37,69)
    val parsed =
      if (parsed0.schema.isEmpty) payloads.toDF("__raw").select()
      else parsed0
    // corrupt-record column appears when some rows are malformed JSON;
    // the raw payload gets a dead-letter copy in the quarantine table
    // (reference consumer.py swallow-and-log keeps the raw message), never
    // a silent drop
    val corruptCol = "_corrupt_record"
    val (clean, nCorrupt) =
      if (parsed.columns.contains(corruptCol)) {
        val corrupt = parsed.filter(col(corruptCol).isNotNull)
        val c = corrupt.count()
        if (c > 0)
          Validation.quarantineRecords(
              corrupt.select(col(corruptCol).as("raw_payload")),
              errno = 400, message = "malformed payload")
            .withColumn("type_id", lit(typeId))
            .write.mode("append").option(NoJobMarker._1, NoJobMarker._2)
            .parquet(registry.quarantinePath(typeId))
        (parsed.filter(col(corruptCol).isNull).drop(corruptCol), c)
      } else (parsed, 0L)

    // 2. Flatten nested objects to `a__b` leaf columns (schemas.py:37-40).
    val flat = Flattener.flatten(clean)

    // 3. Evolve the registry add-only with the inferred flat schema
    //    (models.py:138-153). Existing columns keep their registered type.
    val incoming = StructType(flat.schema.fields.map(f =>
      f.copy(dataType = Inference.normalize(f.dataType))))
    val target = registry.evolve(typeId, incoming)

    // 4. Validate/coerce against the registered schema; incompatible rows
    //    are quarantined, not widened (tests/test_models.py:65-83).
    val v = Validation.validate(flat, target)
    // quarantine count: arithmetic when the caller supplied the sub-batch
    // total (no second pipeline pass); counted only as the fallback
    lazy val nQuarantineCounted = v.quarantined.count()
    def quarantineWrite(): Unit =
      // per-type quarantine path: concurrent type ingests must not share a
      // FileOutputCommitter staging directory
      Validation.quarantineRecords(v.quarantined)
        .withColumn("type_id", lit(typeId))
        .write.mode("append").option(NoJobMarker._1, NoJobMarker._2)
        .parquet(registry.quarantinePath(typeId))

    // 5. Defaults: id (uuid1-hex analog; deterministic content hash also
    //    supported via conf) and last_modified=now (models.py:53-56).
    val lm: org.apache.spark.sql.Column =
      ingestTime.map(t => lit(t)).getOrElse(current_timestamp())
    val withDefaults = v.good
      .withColumn("id", coalesce(col("id").cast(StringType),
        regexp_replace(expr("uuid()"), "-", "")))
      .withColumn("last_modified", coalesce(col("last_modified"), lm))
      // deterministic LWW tie-break for equal last_modified: `_ingest_epoch`
      // orders BATCHES (driver-side µs wall clock, one value per sub-batch),
      // `_ingest_seq` orders rows WITHIN the batch — monotonically_
      // increasing_id is (partitionId << 33 | rowIdx), which follows source
      // order for ordered inputs (files, replayed logs), so the last message
      // of a batch wins exactly like the reference's sequential consumer
      // (consumer.py:79-83). Per-ROW expressions, not a plan-time constant.
      .withColumn("_ingest_epoch", lit(batchEpochMicros()))
      .withColumn("_ingest_seq", monotonically_increasing_id())

    // 6. Append to the per-type table, partitioned by the id-hash bucket
    //    (partition-key layout — point lookups prune to one bucket). Schema
    //    evolution on disk is add-only; readers use mergeSchema
    //    (Engine.table) so older files surface new columns as NULL.
    //    SIZE-AWARE (VERDICT r14 #2): micro-batch-scale sub-batches land in
    //    the L0 zone as one file (see SmallAppendRows); compaction folds
    //    them into the bucketed layout.
    val smallAppend = subTotal.exists(_ <= SmallAppendRows)
    val partCol = if (smallAppend) lit(L0Bucket) else idBucket(col("id"))
    val written = withDefaults.withColumn("_part", partCol).cache()
    try {
      // WRITE-FIRST: the append itself materializes the cache, and its
      // command-level numOutputRows metric reports n — no separate count
      // job per batch. The old n>0 write pre-gate becomes a post-write
      // cleanup: table existence is DDL state, so an all-quarantined FIRST
      // batch must not leave behind the empty dir its append created
      // (appends to existing tables write only a _SUCCESS marker when
      // empty — harmless).
      val tablePath = registry.tablePath(typeId)
      val writeTok = WriteCounts.expect(spark, tablePath)
      val tpath = new org.apache.hadoop.fs.Path(tablePath)
      val hfs = tpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var n = 0L
      // table lock: an append racing a compaction's listing→swap window
      // would otherwise be renamed aside and deleted with the old copy
      registry.withTableLock(typeId) {
        val existedBefore = hfs.exists(tpath)
        // cluster rows by bucket before the partitioned write: ONE file
        // per bucket per append instead of (shuffle partitions × buckets)
        // tiny files — the small-files problem that otherwise eats a
        // table alive at 100 TB append rates (compaction still collapses
        // the per-append log over time)
        // fixed 16-way sizing, NOT repartition(col) + AQE coalescing: the
        // adaptive variant re-plans the exchange per write and measured
        // 2.2 s vs 0.56 s on a streaming-scale append (r14 A/B) — stage
        // materialization overhead dwarfs the 16 tiny task commits
        //
        // Small appends carry a single L0 partition value, so coalesce(1)
        // writes exactly one file with one commit (the upstream micro
        // batch is a handful of partitions — collapsing it costs nothing).
        // Large batches (unknown or > SmallAppendRows) keep the clustered
        // parallel write — one writer task would serialize a real bulk
        // ingest on a 1000-executor cluster.
        (if (smallAppend) written.coalesce(1)
         else written.repartition(NumIdBuckets, col("_part")))
          .write.mode("append").partitionBy("_part")
          .option(NoJobMarker._1, NoJobMarker._2)
          .parquet(tablePath)
        n = WriteCounts.take(spark, tablePath, writeTok)
          .getOrElse(written.count())
        if (n == 0 && !existedBefore) hfs.delete(tpath, true)
      }
      val nQuarantine = subTotal match {
        case Some(total) =>
          val arith = total - nCorrupt - n
          // the arithmetic rests on parser invariants (row-preserving JSON
          // parse, no top-level arrays — the caller's fan-out agg screens
          // those); a NEGATIVE result means an invariant broke, so fall
          // back to the counted path instead of silently skipping the
          // quarantine write with a wrong Report
          if (arith >= 0) arith
          else {
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"arithmetic quarantine count $arith < 0 for type '$typeId' " +
                s"(total=$total corrupt=$nCorrupt written=$n); " +
                "falling back to counted quarantine")
            nQuarantineCounted
          }
        case None => nQuarantineCounted
      }
      if (nQuarantine > 0) quarantineWrite()
      (n, nQuarantine + nCorrupt)
    } finally written.unpersist()
  }
}

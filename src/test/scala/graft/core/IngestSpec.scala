package graft.core

import graft.SparkSpec
import graft.sources.Codecs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end engine behavior mirroring the reference's test suite semantics
  * (SURVEY §5.2): infer→create round-trip, add-a-field evolution,
  * type-conflict quarantine, LWW overwrite, null-drop. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

  private def freshEngine() = Engine.bootstrap(spark, tmpDir("graft-wh"))

  private def env(msgs: String*) = msgs.toDF("message")

  test("infer -> create -> read round-trip with defaults") {
    val h = freshEngine()
    val report = h.ingest(env(
      """{"type_id":"t1","data":{"field":"foo","n":42,"f":42.42,"b":true}}"""),
      ingestTime = Some(t0))
    assert(report.perType === Map("t1" -> 1L))
    val df = h.table("t1")
    val schema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema("field") === StringType)
    assert(schema("n") === LongType)
    assert(schema("f") === DoubleType)
    assert(schema("b") === BooleanType)
    val row = df.collect().head
    assert(row.getAs[String]("id") != null) // auto uuid
    assert(row.getAs[java.sql.Timestamp]("last_modified") === t0)
  }

  test("write-gated ingest: denied types quarantine with the 403 error; " +
      "the rest of the batch continues (VERDICT r18 #3, ref tests/test_views.py:79-118)") {
    val h = freshEngine()
    // t1 exists (created ungated); t_new does not
    h.ingest(env("""{"type_id":"t1","data":{"id":"seed","v":1}}"""),
      ingestTime = Some(t0))
    val perms = graft.operators.Permissions.table(spark, Seq(
      ("u", "t1", true, false, false), // read-only: writes deny
      ("u", "t_ok", true, true, true))) // may create t_ok
    val report = h.ingestAs("u", perms, env(
      """{"type_id":"t1","data":{"id":"a","v":2}}""", // exists, no can_write
      """{"type_id":"t_new","data":{"id":"b"}}""", // new, no can_create
      """{"type_id":"t_ok","data":{"id":"c","v":3}}"""), // new, can_create
      ingestTime = Some(t1))
    // continue-on-deny: the admitted type ingested normally
    assert(report.perType === Map("t_ok" -> 1L))
    assert(report.quarantined === 2L)
    assert(h.table("t_ok").count() === 1L)
    // the denied write never reached t1 (seed row untouched, LWW unbumped)
    val t1rows = h.table("t1").collect()
    assert(t1rows.length === 1 && t1rows.head.getAs[String]("id") === "seed")
    // structured 403 error shape in each type's quarantine
    val q1 = spark.read.parquet(h.registry.quarantinePath("t1")).collect()
    assert(q1.length === 1)
    assert(q1.head.getAs[Int]("errno") === 403)
    assert(q1.head.getAs[String]("error") === "WriteForbidden")
    // row_json nests the raw payload as an escaped JSON string
    assert(q1.head.getAs[String]("row_json").contains("\\\"id\\\":\\\"a\\\""))
    val qn = spark.read.parquet(h.registry.quarantinePath("t_new")).collect()
    assert(qn.length === 1)
    assert(qn.head.getAs[String]("error") === "CreateForbidden")
    // the denied type was never created
    assert(!h.registry.knownTypes.contains("t_new"))
    // duplicate (user, type) grant rows collapse by OR on the INGEST
    // path too (r19 review: .toMap was partition-order last-wins) — a
    // deny row + a grant row must admit deterministically
    val dupPerms = graft.operators.Permissions.table(spark, Seq(
      ("u", "t1", false, false, false),
      ("u", "t1", false, false, true)))
    val dupReport = h.ingestAs("u", dupPerms, env(
      """{"type_id":"t1","data":{"id":"dup","v":9}}"""), ingestTime = Some(t1))
    assert(dupReport.perType === Map("t1" -> 1L))
    assert(dupReport.quarantined === 0L)
  }

  test("mass-deny batch: every denied type quarantines (concurrent fan-out, " +
      "VERDICT r19 #5); admitted types still land") {
    val h = freshEngine()
    val perms = graft.operators.Permissions.table(spark, Seq(
      ("u", "t_ok", true, true, true))) // everything else denies
    val report = h.ingestAs("u", perms, env(
      """{"type_id":"d1","data":{"id":"a"}}""",
      """{"type_id":"d2","data":{"id":"b"}}""",
      """{"type_id":"d3","data":{"id":"c"}}""",
      """{"type_id":"d3","data":{"id":"c2"}}""",
      """{"type_id":"t_ok","data":{"id":"ok"}}"""), ingestTime = Some(t0))
    assert(report.perType === Map("t_ok" -> 1L))
    assert(report.quarantined === 4L)
    for (t <- Seq("d1", "d2", "d3")) {
      val qs = spark.read.parquet(h.registry.quarantinePath(t)).collect()
      assert(qs.length === (if (t == "d3") 2 else 1), s"quarantine of $t")
      assert(qs.forall(_.getAs[Int]("errno") === 403))
      assert(qs.forall(_.getAs[String]("error") === "CreateForbidden"))
      assert(!h.registry.knownTypes.contains(t))
    }
  }

  test("add-a-field evolves schema add-only; old rows read as null") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","field":"foo"}}"""), ingestTime = Some(t0))
    h.ingest(env("""{"type_id":"t","data":{"id":"b","field":"x","field2":"bar"}}"""), ingestTime = Some(t0))
    val df = h.table("t")
    assert(df.columns.contains("field2"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[String]("field2") == null)
    assert(rows(1).getAs[String]("field2") === "bar")
    // registry agrees
    assert(h.registry.get("t").get.fieldNames.contains("field2"))
  }

  test("type conflict quarantines the row, never widens (ref tests/test_models.py:65-83)") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","n":42}}"""), ingestTime = Some(t0))
    val r2 = h.ingest(env("""{"type_id":"t","data":{"id":"b","n":"bar"}}"""), ingestTime = Some(t0))
    assert(r2.quarantined === 1L)
    assert(r2.perType("t") === 0L)
    val df = h.table("t")
    assert(df.schema("n").dataType === LongType) // not widened
    assert(df.count() === 1L)
    // int into a float column DOES fit (colander coercion accepts it)
    val r3 = h.ingest(env("""{"type_id":"t","data":{"id":"c","n":7}}"""), ingestTime = Some(t1))
    assert(r3.perType("t") === 1L)
  }

  test("LWW upsert: same id overwrites; last_modified bumps (ref PUT semantics)") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":1}}"""), ingestTime = Some(t0))
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":2}}"""), ingestTime = Some(t1))
    val df = h.table("t")
    assert(df.count() === 1L)
    val row = df.collect().head
    assert(row.getAs[Long]("v") === 2L)
    assert(row.getAs[java.sql.Timestamp]("last_modified") === t1)
    assert(h.tableLog("t").count() === 2L) // append log keeps history
    // compaction collapses the log to the LWW view
    val compactPath = tmpDir("graft-compact")
    graft.operators.Upserts.compact(
      h.tableLog("t"), Seq("id"), "last_modified", compactPath + "/t")
    val compacted = spark.read.parquet(compactPath + "/t")
    assert(compacted.count() === 1L)
    assert(compacted.collect().head.getAs[Long]("v") === 2L)
  }

  test("within-batch LWW tie: equal (id, last_modified) -> later message wins " +
      "(ref sequential consumer order, consumer.py:79-83)") {
    val h = freshEngine()
    // one batch, same id, same explicit last_modified, different payloads —
    // a plan-time-constant _ingest_seq would pick a nondeterministic winner
    val r = h.ingest(env(
      """{"type_id":"t","data":{"id":"a","v":1,"last_modified":"2024-01-01T00:00:00Z"}}""",
      """{"type_id":"t","data":{"id":"a","v":2,"last_modified":"2024-01-01T00:00:00Z"}}""",
      """{"type_id":"t","data":{"id":"a","v":3,"last_modified":"2024-01-01T00:00:00Z"}}"""))
    assert(r.perType("t") === 3L)
    val served = h.table("t").collect()
    assert(served.length === 1)
    assert(served.head.getAs[Long]("v") === 3L) // the LAST message of the batch
    // and a LATER batch with the same (id, last_modified) beats the earlier one
    h.ingest(env(
      """{"type_id":"t","data":{"id":"a","v":9,"last_modified":"2024-01-01T00:00:00Z"}}"""))
    assert(h.table("t").collect().head.getAs[Long]("v") === 9L)
    // serving view no longer exposes the ingest bookkeeping columns
    assert(!h.table("t").columns.exists(c => c.startsWith("_ingest")))
  }

  test("nested objects flatten to __ columns; nulls never create columns") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","a":{"b":1},"z":null}}"""), ingestTime = Some(t0))
    val df = h.table("t")
    assert(df.columns.contains("a__b"))
    assert(!df.columns.contains("z")) // null dropped before inference
    assert(df.collect().head.getAs[Long]("a__b") === 1L)
  }

  test("missing type_id is dead-lettered; null data is {} (ref consumer.py:33-39)") {
    val h = freshEngine()
    val r = h.ingest(env(
      """{"data":{"x":1}}""",
      """{"type_id":"t","data":null}"""), ingestTime = Some(t0))
    assert(r.deadLetters === 1L)
    assert(r.perType("t") === 1L) // empty payload row still written with defaults
  }

  test("msgpack decode with JSON fallback (ref consumer.py:24-31)") {
    // {"type_id":"mp","data":{"k":7}} in msgpack:
    // fixmap2, fixstr"type_id", fixstr"mp", fixstr"data", fixmap1, fixstr"k", 7
    val mp: Array[Byte] = Array[Byte](
      0x82.toByte,
      0xa7.toByte, 't', 'y', 'p', 'e', '_', 'i', 'd',
      0xa2.toByte, 'm', 'p',
      0xa4.toByte, 'd', 'a', 't', 'a',
      0x81.toByte, 0xa1.toByte, 'k', 0x07)
    assert(Codecs.msgpackToJson(mp) === Some("""{"type_id":"mp","data":{"k":7}}"""))
    // JSON bytes fall through msgpack to the JSON branch
    val js = """{"type_id":"j","data":{}}""".getBytes("UTF-8")
    assert(Codecs.decodeMessage(js) === """{"type_id":"j","data":{}}""")
    // garbage -> null
    assert(Codecs.decodeMessage(Array[Byte](0xc1.toByte)) == null)

    val h = freshEngine()
    val df = Seq(mp, js).toDF("value")
      .withColumn("message", Codecs.decodeMessageUdf(col("value")))
    val r = h.ingest(df, ingestTime = Some(t0))
    assert(r.perType.keySet === Set("mp", "j"))
  }

  test("serving json unflattens and strips nulls (ref schemas.py:42-55)") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","a":{"b":1},"s":"x"}}"""), ingestTime = Some(t0))
    val out = h.toServingJson(h.table("t").drop("last_modified")).collect().head.getString(0)
    assert(out.contains(""""a":{"b":1}"""))
    assert(out.contains(""""s":"x""""))
  }

  test("traversal-shaped type_id dead-letters; no path escapes the warehouse") {
    val wh = tmpDir("graft-wh-sec")
    val h = Engine.bootstrap(spark, wh)
    val marker = tmpDir("graft-outside") // a sibling dir a traversal could hit
    val r = h.ingest(env(
      """{"type_id":"../../x","data":{"id":"a","v":1}}""",
      """{"type_id":"ok_type-1","data":{"id":"b","v":2}}"""), ingestTime = Some(t0))
    assert(r.deadLetters === 1L)
    assert(r.perType === Map("ok_type-1" -> 1L))
    assert(h.registry.knownTypes.forall(_.matches(graft.sources.Codecs.TypeIdPattern)))
    // nothing was created outside the warehouse tables dir
    val tables = new java.io.File(s"$wh/tables").listFiles()
    assert(tables == null || tables.forall(_.getName.matches("[A-Za-z0-9_-]+")))
    assert(new java.io.File(marker).exists()) // sibling untouched
    // and the registry refuses to build (or delete!) a traversal path
    intercept[IllegalArgumentException] { h.registry.tablePath("../../x") }
    intercept[IllegalArgumentException] { h.registry.drop("../../x") }
  }

  test("registry restart preserves array element types; later appends don't poison") {
    val wh = tmpDir("graft-wh-arr")
    val h = Engine.bootstrap(spark, wh)
    h.ingest(env("""{"type_id":"t","data":{"id":"a","tags":[1,2,3],"xs":[1.5,2.5]}}"""),
      ingestTime = Some(t0))
    assert(h.table("t").schema("tags").dataType === ArrayType(LongType))
    // fresh registry over the same warehouse — the persisted-descriptor path
    val h2 = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh); r.bootstrap(); r })
    assert(h2.registry.get("t").get("tags").dataType === ArrayType(LongType))
    assert(h2.registry.get("t").get("xs").dataType === ArrayType(DoubleType))
    // second batch through the RELOADED registry: same array types appended,
    // mergeSchema read stays healthy
    h2.ingest(env("""{"type_id":"t","data":{"id":"b","tags":[7],"xs":[9.5]}}"""),
      ingestTime = Some(t1))
    val df = h2.table("t")
    assert(df.count() === 2)
    assert(df.schema("tags").dataType === ArrayType(LongType))
    assert(df.filter(col("id") === "b").collect().head
      .getAs[Seq[Long]]("tags") === Seq(7L))
    // array-of-struct fields (JSON arrays of objects) round-trip the
    // descriptor codec too: catalogString "struct<...>" element encoding
    h2.ingest(env("""{"type_id":"t2","data":{"id":"a","objs":[{"a":1,"b":"x"}]}}"""),
      ingestTime = Some(t0))
    val h3 = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh); r.bootstrap(); r })
    val objsType = h3.registry.get("t2").get("objs").dataType
    assert(objsType.isInstanceOf[ArrayType] &&
      objsType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType],
      s"objs reloaded as $objsType")
    h3.ingest(env("""{"type_id":"t2","data":{"id":"b","objs":[{"a":2,"b":"y"}]}}"""),
      ingestTime = Some(t1))
    assert(h3.table("t2").count() === 2)
  }

  test("malformed payloads get a dead-letter copy in quarantine, not a silent drop") {
    val h = freshEngine()
    val r = h.ingest(env(
      """{"type_id":"t","data":{"id":"a","v":1}}""",
      """{"type_id":"t","data":5}"""), ingestTime = Some(t0)) // scalar data -> corrupt JSON row
    assert(r.perType("t") === 1L)
    assert(r.quarantined === 1L)
    val q = spark.read.parquet(h.registry.quarantinePath("t"))
    assert(q.count() === 1L)
    val row = q.collect().head
    assert(row.getAs[String]("row_json").contains("5")) // raw payload preserved
    assert(row.getAs[String]("message") === "malformed payload")
    assert(row.getAs[String]("type_id") === "t")
  }

  test("registry runs on the Hadoop FileSystem API (explicit file: scheme)") {
    val wh = "file:" + tmpDir("graft-wh-fs")
    val h = Engine.bootstrap(spark, wh, overrideWarehouse = true)
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":1}}"""), ingestTime = Some(t0))
    assert(h.table("t").count() === 1L)
    // restart-reload over the same URI-style path
    val h2 = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh); r.bootstrap(); r })
    assert(h2.registry.get("t").isDefined)
    h2.ingest(env("""{"type_id":"t","data":{"id":"b","v":2}}"""), ingestTime = Some(t1))
    assert(h2.table("t").count() === 2L)
    // crash-window recovery: simulate a crash between the two renames
    // (descriptors moved aside, replacement not yet in place)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$wh/descriptors"),
      new org.apache.hadoop.fs.Path(s"$wh/descriptors.old"))
    val h3 = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh); r.bootstrap(); r })
    assert(h3.registry.get("t").isDefined) // healed from .old
    assert(h3.table("t").count() === 2L)
  }

  test("partition-key layout: small appends land in L0 as one file; compaction buckets by id hash; point lookup prunes partitions") {
    val h = freshEngine()
    h.ingest(env((1 to 40).map(i =>
      s"""{"type_id":"t","data":{"id":"k$i","v":$i}}"""): _*), ingestTime = Some(t0))
    // micro-batch-scale append: ONE L0 partition dir, ONE data file (the
    // LSM delta zone — no 16-way write amplification per micro append)
    val tableDir = new java.io.File(h.registry.tablePath("t"))
    val dirs0 = tableDir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs0.toSeq === Seq(s"_part=${graft.core.Ingest.L0Bucket}"))
    val l0Files = new java.io.File(tableDir, dirs0.head).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(l0Files.length === 1)
    // point lookup against the uncompacted table is still correct
    assert(h.get("t", "k7").collect().map(_.getAs[Long]("v")).toSeq === Seq(7L))
    // compaction folds L0 into the id-hash buckets
    h.compact("t")
    val dirs = tableDir.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("_part=")))
    assert(dirs.length > 1) // 40 ids spread over several of the 16 buckets
    assert(!dirs.contains(s"_part=${graft.core.Ingest.L0Bucket}")) // L0 folded away
    // point lookup: correct row AND a partition filter in the scan
    val got = h.get("t", "k7")
    assert(got.collect().map(_.getAs[Long]("v")).toSeq === Seq(7L))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      "expected a _part partition filter in the scan:\n" + plan)
    // serving views never expose the layout column
    assert(!h.table("t").columns.contains("_part"))
    assert(!got.columns.contains("_part"))
  }

  test("bulk appends (> SmallAppendRows) write the bucketed layout directly, no L0") {
    // the declared sf-test ingests are all micro-batch scale and take the
    // L0 path — this is the only coverage of the bulk clustered write
    val h = freshEngine()
    val n = Ingest.SmallAppendRows + 1
    val envelopes = spark.range(n).select(concat(
      lit("""{"type_id":"t","data":{"id":"k"""), col("id"),
      lit("""","v":"""), col("id"), lit("}}")).as("message"))
    h.ingest(envelopes, ingestTime = Some(t0))
    val dirs = new java.io.File(h.registry.tablePath("t"))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(!dirs.contains(s"_part=${Ingest.L0Bucket}"), "bulk append must not land in L0")
    assert(dirs.length === Ingest.NumIdBuckets) // 100k ids cover all 16 buckets
    assert(h.table("t").count() === n)
    // point lookup prunes to one bucket dir and LWW-reads the right row
    assert(h.get("t", "k77").collect().head.getAs[Long]("v") === 77L)
  }

  test("compact collapses the log in place; pruned lookups and later LWW appends survive") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":1}}""",
      """{"type_id":"t","data":{"id":"b","v":2}}"""), ingestTime = Some(t0))
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":3}}"""), ingestTime = Some(t1))
    assert(h.tableLog("t").count() === 3L)
    val before = h.table("t").orderBy("id").collect().map(r =>
      (r.getAs[String]("id"), r.getAs[Long]("v"))).toSeq

    h.compact("t")
    assert(h.tableLog("t").count() === 2L) // log collapsed to live rows
    val after = h.table("t").orderBy("id").collect().map(r =>
      (r.getAs[String]("id"), r.getAs[Long]("v"))).toSeq
    assert(after === before)
    // partition layout preserved: lookups still prune
    val plan = h.get("t", "a").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"))
    assert(h.get("t", "a").collect().head.getAs[Long]("v") === 3L)
    // a LATER append still LWW-wins over compacted rows
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":9}}"""),
      ingestTime = Some(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
    assert(h.get("t", "a").collect().head.getAs[Long]("v") === 9L)
  }

  test("compactIfNeeded triggers on file count only (metadata policy)") {
    val h = freshEngine()
    (1 to 4).foreach { i =>
      h.ingest(env(s"""{"type_id":"t","data":{"id":"a","v":$i}}"""), ingestTime = Some(t0))
    }
    val before = h.registry.dataFileCount("t")
    assert(before >= 4) // one file per append at minimum
    assert(!h.compactIfNeeded("t", maxFiles = 1000)) // under threshold: no-op
    assert(h.registry.dataFileCount("t") === before)
    assert(h.compactIfNeeded("t", maxFiles = 2)) // over threshold: compacts
    assert(h.registry.dataFileCount("t") < before)
    assert(h.table("t").collect().head.getAs[Long]("v") === 4L)
  }

  test("L0 maintenance contract: micro-append growth -> compactIfNeeded keeps the table bounded; lookups stay pruned mid-stream") {
    // VERDICT r15 #5: the L0 zone's scaladoc claims it is "bounded by
    // compaction cadence" — this pins the claim. A maintenance loop of 18
    // micro-appends with the file-count policy after each one must (a)
    // never observe the table above the policy's bound right after the
    // check, (b) actually fire the policy repeatedly as L0 refills, and
    // (c) keep point lookups partition-pruned and LWW-correct at EVERY
    // intermediate zone mix (pure L0, pure buckets, buckets + refilling L0).
    val h = freshEngine()
    val maxFiles = 4
    var compactions = 0
    for (i <- 1 to 18) {
      val ts = new java.sql.Timestamp(t0.getTime + i * 60000L)
      h.ingest(env(s"""{"type_id":"t","data":{"id":"k${i % 3}","v":$i}}"""),
        ingestTime = Some(ts))
      // mid-stream lookup: correct LWW winner whatever zones hold the id
      val got = h.get("t", s"k${i % 3}")
      assert(got.collect().head.getAs[Long]("v") === i.toLong, s"append $i")
      // and the scan is pruned — the {idBucket(id), L0} two-partition
      // contract renders as a _part partition filter, never a full scan
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("_part"),
        s"append $i: expected a _part partition filter:\n$plan")
      if (h.compactIfNeeded("t", maxFiles = maxFiles)) compactions += 1
      // the invariant the maintenance cadence guarantees: bounded file
      // count after every policy pass (compaction rewrites to <= 3 bucket
      // files here — 3 ids — so the bound holds with slack for new L0)
      val n = h.registry.dataFileCount("t")
      assert(n <= maxFiles, s"after append $i + policy: $n files > $maxFiles")
    }
    assert(compactions >= 3,
      s"policy fired only $compactions times over 18 micro-appends — L0 is not being folded")
    // L0 refills between compactions and the LAST state still serves: the
    // final winners are the last write per id
    val fin = h.table("t").orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("v"))).toSeq
    assert(fin === Seq(("k0", 18L), ("k1", 16L), ("k2", 17L)))
  }

  test("vacuum: prefix collapses to LWW winners, suffix history survives, horizon reads exact") {
    val h = freshEngine()
    val t2 = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    // gen 1: a,b,c — gen 2: a,b overwritten — horizon — gen 3: a again
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":1}}""",
      """{"type_id":"t","data":{"id":"b","v":2}}""",
      """{"type_id":"t","data":{"id":"c","v":3}}"""), ingestTime = Some(t0))
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":10}}""",
      """{"type_id":"t","data":{"id":"b","v":20}}"""), ingestTime = Some(t1))
    val horizon = h.currentEpoch("t")
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":100}}"""),
      ingestTime = Some(t2))
    val latest = h.currentEpoch("t")
    def served(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("v"))).toSeq
    val before = served(h.table("t"))
    val asOfHorizonBefore = served(h.tableAsOf("t", horizon))
    val changesBefore = h.changesBetween("t", horizon, latest, Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("change"))).toSeq

    h.vacuum("t", horizon)
    assert(h.tableLog("t").count() === 4L,
      "3 winners of gens 1-2 + gen-3's row must survive the vacuum")
    // serving, horizon-pinned as-of, and horizon-anchored CDC are exact
    assert(served(h.table("t")) === before)
    assert(served(h.tableAsOf("t", horizon)) === asOfHorizonBefore)
    assert(h.changesBetween("t", horizon, latest, Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("change"))).toSeq
      === changesBefore)
    // history: suffix version survives (a has 2), prefix collapsed (b,c 1)
    val versions = h.history("t").groupBy("id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(versions === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    // pre-horizon as-of reads DEGRADE: winners keep their ORIGINAL epochs
    // (the compact contract), so a pin before the horizon sees only the
    // surviving winners written <= the pin — a/b's gen-1 versions are
    // gone (their winners carry gen-2's epoch), c's gen-1 row IS the winner
    val asOfGen1 = served(h.tableAsOf("t", horizon - 1))
    assert(asOfGen1 === Seq(("c", 3L)),
      "pre-horizon as-of must serve only surviving winners written <= the pin")
    // a later append still LWW-wins over vacuumed rows
    h.ingest(env("""{"type_id":"t","data":{"id":"b","v":200}}"""),
      ingestTime = Some(java.sql.Timestamp.valueOf("2024-01-04 00:00:00")))
    assert(h.get("t", "b").collect().head.getAs[Long]("v") === 200L)
  }

  test("replaying the same batch is effectively idempotent (LWW absorbs the duplicate)") {
    val h = freshEngine()
    val batch = env(
      """{"type_id":"t","data":{"id":"a","v":1}}""",
      """{"type_id":"t","data":{"id":"b","v":2}}""")
    h.ingest(batch, ingestTime = Some(t0))
    val first = h.table("t").orderBy("id").collect().toSeq
    h.ingest(batch, ingestTime = Some(t0)) // replay: same ids, same last_modified
    assert(h.tableLog("t").count() === 4L) // log keeps both copies
    val replayed = h.table("t").orderBy("id").collect().toSeq
    assert(replayed === first) // serving view unchanged — replay-safe
  }

  test("immutable schema refuses new types and evolution") {
    val wh = tmpDir("graft-wh-imm")
    val h = Engine.bootstrap(spark, wh)
    h.ingest(env("""{"type_id":"t","data":{"id":"a","v":1}}"""), ingestTime = Some(t0))
    val frozen = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh, immutableSchema = true); r.bootstrap(); r })
    // known type, known fields: fine
    frozen.ingest(env("""{"type_id":"t","data":{"id":"b","v":2}}"""), ingestTime = Some(t1))
    assert(frozen.table("t").count() === 2)
    // new field or new type: refused
    intercept[IllegalStateException] {
      frozen.ingest(env("""{"type_id":"t","data":{"id":"c","w":9}}"""), ingestTime = Some(t1))
    }
    intercept[IllegalStateException] {
      frozen.ingest(env("""{"type_id":"t2","data":{"id":"c"}}"""), ingestTime = Some(t1))
    }
  }

  test("drop removes table and descriptor (ref models.py:176-182)") {
    val h = freshEngine()
    h.ingest(env("""{"type_id":"t","data":{"id":"a"}}"""), ingestTime = Some(t0))
    assert(h.registry.knownTypes.contains("t"))
    h.registry.drop("t")
    assert(!h.registry.knownTypes.contains("t"))
    assert(!new java.io.File(h.registry.tablePath("t")).exists())
  }

  test("second handle on the same warehouse sees another handle's evolve; compact keeps the column") {
    // the r11 explicit-schema serving read makes freshness the registry's
    // job: handle B (loaded before A's evolve) must refresh before serving
    // or compacting, or compact would physically DROP the evolved column
    val wh = tmpDir("graft-wh-two-handles")
    val a = Engine.bootstrap(spark, wh, overrideWarehouse = true)
    a.ingest(env("""{"type_id":"t","data":{"id":"x","v":1}}"""), ingestTime = Some(t0))
    val b = Engine.Handle(spark,
      { val r = new SchemaRegistry(spark, wh); r.bootstrap(); r })
    assert(b.registry.get("t").exists(!_.fieldNames.contains("extra")))
    // A evolves t and appends a row carrying the new column
    a.ingest(env("""{"type_id":"t","data":{"id":"y","v":2,"extra":"keep"}}"""),
      ingestTime = Some(t1))
    // B serves the evolved column without re-bootstrapping...
    val served = b.table("t").orderBy("id").collect()
    assert(served.map(_.getAs[String]("extra")).toSeq === Seq(null, "keep"))
    // ...and B's compact preserves it
    b.compact("t")
    val after = b.table("t").orderBy("id").collect()
    assert(after.map(_.getAs[String]("extra")).toSeq === Seq(null, "keep"))
    assert(after.length === 2)
  }

  test("a foreign/legacy descriptors dir fails loud instead of reading as empty") {
    val wh = tmpDir("graft-wh-foreign")
    val dir = new java.io.File(wh, "descriptors")
    dir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000.parquet").toPath, Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] {
      val r = new SchemaRegistry(spark, wh); r.bootstrap()
    }
  }
}

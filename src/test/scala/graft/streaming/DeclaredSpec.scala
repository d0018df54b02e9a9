package graft.streaming

import graft.{SparkSpec, Tables, Queries}
import org.apache.spark.sql.DataFrame

/** The declared streaming queries must be micro-batch-boundary INVARIANT:
  * running the stream over the file-split source yields exactly the one-shot
  * batch answer (that invariance is what lets the DuckDB oracle gate them).
  */
class DeclaredSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("streaming tumbling partials merge to the batch aggregate") {
    val streamed = Queries.qStreamTumbling(spark, sf())
    val batch = Queries.qWindowTumbling(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("stateful sliding-window stream equals the batch sliding aggregate") {
    // append-mode windowed agg: every real window must be flushed exactly
    // once by the sentinel-driven watermark advance, none dropped, no
    // sentinel window leaked
    val streamed = Queries.qStreamSliding(spark, sf())
    val batch = Queries.qWindowSliding(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming heavy-hitters maintenance equals batch exact heavy hitters") {
    val streamed = Queries.qStreamHeavyHitters(spark, sf())
    val batch = Queries.qAggHeavyHitters(spark, sf())
      .orderBy("word")
    assert(rows(streamed) == rows(batch))
  }

  test("streaming drift maintenance equals the one-shot batch KS") {
    val streamed = Queries.qStreamDrift(spark, sf())
    val batch = Queries.qDriftKs(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming trend maintenance equals the one-shot batch OLS") {
    val streamed = Queries.qStreamTrend(spark, sf())
    val batch = Queries.qTrendOls(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming SCD2 maintenance equals the one-shot batch history") {
    val streamed = Queries.qStreamScd2(spark, sf())
    val batch = Queries.qScd2History(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming dedup emits exactly the distinct key set") {
    val streamed = Queries.qStreamDedup(spark, sf())
    val batch = Tables.events(spark, sf())
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
    assert(rows(streamed) == rows(batch))
  }

  test("watermarked streaming dedup emits exactly the distinct key set") {
    // bounded-state variant: dropDuplicatesWithinWatermark with a horizon
    // spanning the fixture must still equal batch DISTINCT for every split
    val streamed = Queries.qStreamDedupWatermark(spark, sf())
    val batch = Tables.events(spark, sf())
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
    assert(rows(streamed) == rows(batch))
  }

  test("late-drop stream drops the planted row and keeps every real key") {
    val streamed = Queries.qStreamLateDrop(spark, sf())
    // the planted marker must have been dropped by the watermark filter...
    assert(streamed.filter(
      org.apache.spark.sql.functions.col("user_id") < 0L).count() === 0L,
      "planted late row leaked past the watermark")
    // ...and no real key was lost (no eviction: ts is not a dedup key)
    val batch = Tables.events(spark, sf())
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")
    assert(rows(streamed) == rows(batch))
  }

  test("stream-stream join emits exactly the batch interval-join pair set") {
    import org.apache.spark.sql.functions._
    val streamed = Queries.qStreamStreamJoin(spark, sf())
    val ev = Tables.events(spark, sf())
      .select("event_id", "user_id", "event_type", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val batch = c.join(p,
        c("user_id") === p("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("buy_id"), col("buy_ts"))
      .orderBy("user_id", "click_id", "buy_id")
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0) // the window must actually match pairs
  }

  test("stream-static join enriches every event with the batch profile") {
    import org.apache.spark.sql.functions._
    val streamed = Queries.qStreamStaticJoin(spark, sf())
    val ev = Tables.events(spark, sf()).select("event_id", "user_id", "ts")
    val profile = ev.groupBy("user_id")
      .agg(min("ts").as("first_ts"), count(lit(1)).as("n_events"))
    val batch = ev.join(profile, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("first_ts"), col("n_events"),
        (col("ts") === col("first_ts")).as("is_first"))
      .orderBy("event_id")
    assert(rows(streamed) == rows(batch))
    // ≥: ties on a user's min ts (us precision) can mark two firsts
    assert(streamed.filter(col("is_first")).count() >= profile.count())
  }

  test("outer stream-stream join: eviction emits exactly the batch left join") {
    import org.apache.spark.sql.functions._
    val streamed = Queries.qStreamStreamJoinOuter(spark, sf())
    val ev = Tables.events(spark, sf())
      .select("event_id", "user_id", "event_type", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val batch = c.join(p,
        c("user_id") === p("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("buy_id"), col("buy_ts"))
      .orderBy("user_id", "click_id", "buy_id")
    assert(rows(streamed) == rows(batch))
    // the eviction path must actually fire: some clicks have no purchase
    assert(streamed.filter(col("buy_id").isNull).count() > 0)
  }

  test("full-outer stream-stream join: BOTH sides' eviction emits the batch full join") {
    import org.apache.spark.sql.functions._
    val streamed = Queries.qStreamStreamJoinFull(spark, sf())
    val ev = Tables.events(spark, sf())
      .select("event_id", "user_id", "event_type", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val batch = c.join(p,
        col("c_user") === col("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"),
        "full_outer")
      .select(coalesce(col("c_user"), col("b_user")).as("user_id"),
        col("click_id"), col("click_ts"), col("buy_id"), col("buy_ts"))
      .orderBy("user_id", "click_id", "buy_id")
    assert(rows(streamed) == rows(batch))
    // both eviction directions must actually fire
    assert(streamed.filter(col("buy_id").isNull).count() > 0,
      "no unmatched clicks — left eviction untested")
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "no unmatched purchases — right eviction untested")
  }

  test("streaming sessionization equals batch session_window exactly") {
    // flatMapGroupsWithState sessions (arrival-closed mid-stream + sentinel
    // timeout flush) must reproduce the session_window aggregate: same
    // starts, same last+gap ends, same per-session event counts
    val streamed = Queries.qStreamSession(spark, sf())
    val batch = Queries.qSessionWindow(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming engine ingest serves the same view as one batch ingest") {
    val streamed = Queries.qStreamEngineIngest(spark, sf())
    // batch twin: the SAME slice through one h.ingest call
    val events = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup" &&
        org.apache.spark.sql.functions.col("event_id") <= 1500)
    val wh = tmpDir("declared-engine-batch")
    val h = graft.core.Engine.bootstrap(spark, wh, overrideWarehouse = true)
    h.ingest(graft.Flagship.envelopesFrom(spark, events))
    val batch = h.table("signup").select(
        org.apache.spark.sql.functions.col("id").cast("long").as("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("props__k").as("k"),
        org.apache.spark.sql.functions.col("last_modified").as("ts"))
      .orderBy("event_id")
    assert(rows(streamed) == rows(batch))
  }

  test("mid-stream compaction maintenance: layout collapsed, answer unchanged") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf())
      .filter(col("event_type") === "signup" && col("event_id") <= 1000)
    val dir = tmpDir("declared-stream-compact")
    val streamed = graft.streaming.Declared.engineIngestCompacting(spark,
      graft.Flagship.envelopesFrom(spark, events), dir,
      serveType = "signup", maxFilesPerType = 16)
    // the maintenance loop really compacted: two ~16-file appends would
    // leave ~32 files, the post-batch rewrite collapses to <= threshold
    val h = graft.core.Engine.bootstrap(spark, dir + "/wh")
    val nFiles = h.registry.dataFileCount("signup")
    assert(nFiles <= 16, s"maintenance never compacted: $nFiles files")
    // ...and the serving answer equals one batch ingest of the same slice
    val wh = tmpDir("declared-stream-compact-batch")
    val hb = graft.core.Engine.bootstrap(spark, wh, overrideWarehouse = true)
    hb.ingest(graft.Flagship.envelopesFrom(spark, events))
    val cols = Seq("id", "user_id", "value", "props__k", "last_modified")
    assert(rows(streamed.selectExpr(cols: _*).orderBy("id")) ==
      rows(hb.table("signup").selectExpr(cols: _*).orderBy("id")))
  }

  test("streaming minhash-index maintenance equals the one-shot batch near-dups") {
    // per-batch signature folds + end-of-stream candidate stage must land
    // on exactly the batch fixed-family pair set (signatures are
    // per-document; the join sees only the final index)
    val streamed = Queries.qStreamDedupMinhash(spark, sf())
    val batch = Queries.qDedupMinhashFixed(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming end-to-end pretrain pipeline equals the one-shot batch build") {
    // the COMPOSED folds (quality gate + digest + signatures per batch;
    // keepers, banded near-dup, chunking over the state at rest) must land
    // on exactly the batch pipeline's chunk set — keeper min is
    // order-free, every end-of-stream stage sees only the final state
    val streamed = Queries.qStreamPipelinePretrain(spark, sf())
    val batch = Queries.qPipelinePretrain(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("minhash-index maintenance over an empty source: no pairs, right shape") {
    import spark.implicits._
    val docs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val got = graft.streaming.Declared.minhashIndexMaintain(spark, docs,
      "doc_id", "text", k = 3, bands = 8, rowsPerBand = 4,
      threshold = 0.5, maxBucket = 1000, tmpDir("declared-mh-empty"))
    assert(got.columns.toSeq == Seq("id_a", "id_b", "jac"))
    assert(got.isEmpty)
  }

  test("streaming inverted-index maintenance equals the one-shot batch index") {
    // per-batch df-add + first-cap posting re-truncation must land on
    // exactly the batch index (min-k union is associative)
    val streamed = Queries.qStreamTextIndex(spark, sf())
    val batch = Queries.qInvertedIndex(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming IVF-index maintenance equals the one-shot batch ANN") {
    // per-batch cell-assignment folds + end-of-stream probe/rank must land
    // on exactly the batch IVF top-k (assignment is per-vector given the
    // offline-trained codebook; the probe stage sees only the final index)
    val streamed = Queries.qStreamVecIvf(spark, sf())
    val batch = Queries.qVecAnnIvf(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("streaming incremental clusters equal the one-shot batch clustering") {
    // incremental fold over 2 edge micro-batches must land on exactly the
    // batch CC labeling (stars ∪ new edges ≡ full history)
    val streamed = Queries.qStreamDedupCluster(spark, sf())
    val batch = Queries.qDedupCluster(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("incremental clusters with an empty edge stream: every doc a singleton") {
    import spark.implicits._
    val docs = (1L to 4L).toDF("doc_id")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val got = graft.streaming.Declared.incrementalClusters(spark, docs,
        "doc_id", pairs, tmpDir("declared-cc-empty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === (1L to 4L).map(i => (i, i, 1L)).toSet)
  }

  test("streaming CDC log: replaying the per-batch deltas reconstructs the final state") {
    import org.apache.spark.sql.functions._
    val log = Queries.qStreamChanges(spark, sf())
    // an append-only source can never produce a delete between pins
    assert(log.filter(col("change") === "delete").isEmpty)
    // every update's before-image genuinely differs from its after-image
    assert(log.filter(col("change") === "update" &&
      col("value_before") <=> col("value_after")).isEmpty)
    // CDC contract: apply batch 0's inserts to an empty state, then batch
    // 1's upserts on top — the replayed state must equal the one-shot
    // batch LWW view (unchanged keys ride through from batch 0)
    val b0 = log.filter(col("batch") === 0)
      .select(col("user_id"), col("d"), col("value_after").as("value"))
    val b1 = log.filter(col("batch") === 1)
      .select(col("user_id"), col("d"), col("value_after").as("value"))
    val replay = b1.unionByName(
      b0.join(b1.select("user_id", "d"), Seq("user_id", "d"), "left_anti"))
    val batchState = graft.operators.Upserts.lwwView(
        Tables.events(spark, sf())
          .withColumn("d", date_trunc("day", col("ts"))),
        Seq("user_id", "d"), "ts", Seq("event_id"))
      .select("user_id", "d", "value")
    assert(rows(replay.orderBy("user_id", "d")) ==
      rows(batchState.orderBy("user_id", "d")))
  }

  test("mid-stream evolution: registry gains the field, pre-evolution rows serve null") {
    import org.apache.spark.sql.functions._
    val out = Queries.qStreamEvolve(spark, sf())
    assert(out.columns.contains("extra"),
      "the add-only evolve must surface the batch-1 field in the serving view")
    val nullExtra = out.filter(col("extra").isNull)
      .select("event_id").collect().map(_.getLong(0))
    assert(nullExtra.nonEmpty && nullExtra.forall(_ <= 700),
      "exactly the pre-evolution (batch-0) ids serve null for the new field")
    assert(out.filter(col("event_id") > 700 &&
      col("extra") =!= col("event_id") * 7).isEmpty)
  }

  test("mid-stream conflict rows land in the quarantine table, not on the floor") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // minimal twin of q_stream_quarantine with a KNOWN dir so the
    // quarantine side (invisible in the declared serving output) is
    // inspectable: id 1's overwrite is uncastable, id 2's coerces
    def msg(id: Long, lm: String, v: String): String =
      s"""{"type_id":"t","data":{"id":"$id","last_modified":"$lm","value":$v}}"""
    val env0 = Seq(
      msg(1, "2024-01-01 00:00:00", "10.5"),
      msg(2, "2024-01-01 00:00:00", "20.5")).toDF("message")
    val env1 = Seq(
      msg(1, "2024-01-02 00:00:00", "\"conflict\""),
      msg(2, "2024-01-02 00:00:00", "\"123.5\"")).toDF("message")
    val dir = java.nio.file.Files.createTempDirectory("stream-quarantine-twin").toString
    val served = graft.streaming.Declared
      .engineIngestEvolving(spark, Seq(env0, env1), dir, serveType = "t")
      .select(col("id"), col("value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(served === Map("1" -> 10.5, "2" -> 123.5),
      "rejected overwrite keeps the original; numeric string coerces and lands")
    val quarantined = spark.read.parquet(dir + "/wh/quarantine/t")
    assert(quarantined.count() === 1L)
    assert(quarantined.filter(col("row_json").contains("conflict")).count() === 1L,
      "the uncastable row must be captured with its payload, not dropped")
  }

  test("CDC restart run equals the uninterrupted run exactly") {
    // the declared restart key crashes inside batch 1 and recovers from
    // the checkpoint; its log must be indistinguishable from a run that
    // never crashed
    val restarted = Queries.qStreamChangesRestart(spark, sf())
    val uninterrupted = graft.streaming.Declared.changesMaintain(spark,
        Tables.events(spark, sf())
          .filter(org.apache.spark.sql.functions.col("event_type") === "signup"),
        java.nio.file.Files.createTempDirectory("cdc-uninterrupted").toString)
      .select("user_id", "d", "batch", "change", "value_before", "value_after")
      .orderBy("batch", "user_id", "d")
    assert(rows(restarted) == rows(uninterrupted))
  }

  test("streaming LWW state equals the batch LWW view") {
    val streamed = Queries.qStreamLww(spark, sf())
    val batch = graft.operators.Upserts.lwwView(
        Tables.events(spark, sf()), Seq("user_id"), "ts", Seq("event_id"))
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
    assert(rows(streamed) == rows(batch))
  }

  test("hybrid served from stream-maintained indexes equals the batch hybrid " +
      "(VERDICT r18 #6: the maintain->serve hand-off)") {
    val streamed = Queries.qStreamHybrid(spark, sf())
    val batch = Queries.qHybridRrf(spark, sf())
    assert(rows(streamed) == rows(batch))
  }

  test("srcKeyFor: regenerated input files invalidate the cross-JVM source cache key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srckey").toFile
    val f = new java.io.File(dir, "events.parquet")
    java.nio.file.Files.write(f.toPath, "v1".getBytes)
    f.setLastModified(1700000000000L)
    val k1 = Declared.srcKeyFor("q_x", dir.toString)
    assert(k1 === Declared.srcKeyFor("q_x", dir.toString)) // stable
    assert(k1 !== Declared.srcKeyFor("q_y", dir.toString)) // per-query
    // same path, new bytes (the r9 testdata-regeneration hazard): length
    // or mtime change flips the fingerprint
    java.nio.file.Files.write(f.toPath, "v2-longer".getBytes)
    f.setLastModified(1700000001000L)
    assert(k1 !== Declared.srcKeyFor("q_x", dir.toString))
  }
}

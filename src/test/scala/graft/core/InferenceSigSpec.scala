package graft.core

import graft.SparkSpec
import graft.plans.JsonShape
import org.apache.spark.sql.types._
import scala.util.Random

/** The inference-cache soundness contract (plans/JsonShape.scala): a batch's
  * shape-signature set determines the `spark.read.json` inferred schema, so
  * a (type, signature) cache hit that skips the inference scan is
  * bit-identical to a cold run. The empirical edge semantics here (empty
  * structs/arrays dropped, alphabetical field order, bool+long→string,
  * struct+scalar→string, duplicate keys kept, BigInteger→value-dependent
  * decimal) were probed against Spark 4.1.2 directly. */
class InferenceSigSpec extends SparkSpec {
  import spark.implicits._

  // --- the per-row kernel ------------------------------------------------

  test("shape classes: scalars, nesting, arrays, null/empty-string folding") {
    assert(JsonShape.signature("""{"a":1}""") === "a:l")
    assert(JsonShape.signature("""{"a":1.5}""") === "a:d")
    assert(JsonShape.signature("""{"a":true}""") === "a:b")
    assert(JsonShape.signature("""{"a":"x"}""") === "a:s")
    assert(JsonShape.signature("""{"a":null}""") === "a:0")
    // Spark infers NullType for the EMPTY string — same class as null
    assert(JsonShape.signature("""{"a":""}""") === "a:0")
    assert(JsonShape.signature("""{"z":1,"a":"x"}""") === "a:s;z:l")
    assert(JsonShape.signature("""{"n":{"b":1,"c":[2.5,"y"]}}""")
      === "n.b:l;n.c[]:d;n.c[]:s")
    // {} contributes nothing (merge identity), at any level
    assert(JsonShape.signature("""{}""") === "")
    assert(JsonShape.signature("""{"a":{}}""") === "")
    assert(JsonShape.signature("""{"a":[]}""") === "a[]:0")
    assert(JsonShape.signature("""{"a":[null]}""") === "a[]:0")
    assert(JsonShape.signature("""{"a":[[1],["x"]]}""") === "a[][]:l;a[][]:s")
    // duplicate leaf classes dedupe; distinct classes both appear
    assert(JsonShape.signature("""{"a":[1,2,3]}""") === "a[]:l")
  }

  test("shape escaping: structural characters in field names cannot alias") {
    val dotted = JsonShape.signature("""{"a.b":1}""")
    val nested = JsonShape.signature("""{"a":{"b":1}}""")
    assert(dotted !== nested)
    assert(JsonShape.signature("""{"x:y;z":1}""").nonEmpty)
  }

  test("shape bails on everything the model does not reproduce") {
    val bails = Seq(
      """[1,2]""",            // top-level array
      """5""",                // top-level scalar
      """not json at all""",  // malformed
      """{"a":1""",           // truncated
      """{"a":1} extra""",    // trailing content
      """{"a":1,"a":"x"}""",  // duplicate key (Spark keeps BOTH fields)
      """{'a':1}""",          // single quotes (Spark accepts, Jackson-default doesn't)
      """{"a":99999999999999999999999}""", // BigInteger: decimal(p,0), p value-dependent
      "")
    for (j <- bails)
      assert(JsonShape.signature(j) === JsonShape.Bail, s"input: $j")
  }

  // --- the soundness property --------------------------------------------

  private def inferSchema(rows: Seq[String]): StructType =
    spark.read.option("dropFieldIfAllNull", "true")
      .json(spark.createDataset(rows)).schema

  private def sigSet(rows: Seq[String]): Set[String] =
    rows.map(JsonShape.signature).toSet

  test("equal signature sets infer equal schemas (randomized row pool)") {
    val pool = Seq(
      """{"a":1}""", """{"a":7}""", """{"a":-3}""",
      """{"a":1.5}""", """{"a":2.5e10}""",
      """{"a":"x"}""", """{"a":"longer string"}""", """{"a":""}""",
      """{"a":true}""", """{"a":null}""", """{}""",
      """{"b":{"c":1}}""", """{"b":{"c":9},"a":1}""", """{"b":{}}""",
      """{"arr":[1,2]}""", """{"arr":[]}""", """{"arr":["x"]}""",
      """{"z":1,"m":"v"}""", """{"m":"w"}""")
    val rnd = new Random(42)
    // many random batches; group by signature set; within a group every
    // batch must infer the same schema (incl. field ORDER — parse depends
    // on it)
    val batches = (1 to 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
    }
    val bySig = batches.groupBy(sigSet)
    var comparisons = 0
    for ((sig, group) <- bySig if group.size > 1) {
      val schemas = group.map(inferSchema).distinct
      assert(schemas.size === 1,
        s"sig $sig inferred ${schemas.size} distinct schemas: $schemas")
      comparisons += group.size - 1
    }
    assert(comparisons > 10) // the sweep actually exercised collisions
  }

  test("cache-relevant edges: dropped fields and cross-class merges") {
    // empty struct/array/null/empty-string fields are DROPPED (sig folds
    // them consistently)
    assert(inferSchema(Seq("""{"a":{}}""")).isEmpty)
    assert(inferSchema(Seq("""{"a":[]}""")).isEmpty)
    assert(inferSchema(Seq("""{"a":null}""")).isEmpty)
    assert(inferSchema(Seq("""{"a":""}""")).isEmpty)
    // cross-class merges are functions of the class SET
    assert(inferSchema(Seq("""{"a":true}""", """{"a":1}"""))("a").dataType
      === StringType)
    assert(inferSchema(Seq("""{"a":1}""", """{"a":1.5}"""))("a").dataType
      === DoubleType)
    assert(inferSchema(Seq("""{"a":[]}""", """{"a":[2]}"""))("a").dataType
      === ArrayType(LongType))
    // inferred field order is alphabetical regardless of encounter order
    assert(inferSchema(Seq("""{"z":1,"a":2}""")).fieldNames.toSeq
      === Seq("a", "z"))
    assert(inferSchema(Seq("""{"z":1}""", """{"a":2}""")).fieldNames.toSeq
      === Seq("a", "z"))
  }

  // --- end-to-end: warm cache == cold cache ------------------------------

  test("repeat ingest of a known shape is byte-identical (cache hit path)") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val msgs = Seq(
      """{"type_id":"t","data":{"id":"a","n":1,"s":"x","nest":{"k":true}}}""",
      """{"type_id":"t","data":{"id":"b","n":2,"s":"","tags":[1,2]}}""",
      """{"type_id":"t","data":{"id":"c","n":null}}""").toDF("message")
    // two engines, fresh warehouses: the first ingest of each shape is a
    // cache MISS on engine 1 and a HIT on engine 2 (process-global cache) —
    // tables must match exactly
    val h1 = Engine.bootstrap(spark, tmpDir("graft-sig1"))
    val h2 = Engine.bootstrap(spark, tmpDir("graft-sig2"))
    val hits0 = Ingest.schemaCacheHits.get()
    val r1 = h1.ingest(msgs, ingestTime = Some(t0))
    val r2 = h2.ingest(msgs, ingestTime = Some(t0))
    assert(r1 === r2)
    // the second ingest of the same shape must actually HIT the cache —
    // the skip-the-inference-scan claim as an assertion, not prose
    assert(Ingest.schemaCacheHits.get() > hits0,
      "repeat ingest of a known shape never hit the schema cache")
    val c1 = h1.table("t").drop("_ingest_epoch", "_ingest_seq", "id")
    val c2 = h2.table("t").drop("_ingest_epoch", "_ingest_seq", "id")
    assert(c1.schema === c2.schema)
    assert(c1.orderBy("n").collect().toSeq === c2.orderBy("n").collect().toSeq)
    // and a DIFFERENT shape for the same type still evolves (no stale hit)
    val r3 = h2.ingest(
      Seq("""{"type_id":"t","data":{"id":"d","extra":4.5}}""").toDF("message"),
      ingestTime = Some(t0))
    assert(r3.perType("t") === 1L)
    assert(h2.table("t").schema.fieldNames.contains("extra"))
  }

  test("write-first semantics: empty appends never clobber or create tables") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val wh = tmpDir("graft-sig-empty")
    val h = Engine.bootstrap(spark, wh)
    // EXISTING table + all-quarantined batch: the (empty) append that
    // write-first now always performs must leave the table intact
    val r1 = h.ingest(
      Seq("""{"type_id":"u","data":{"id":"a","n":1}}""").toDF("message"),
      ingestTime = Some(t0))
    assert(r1.perType("u") === 1L)
    val r2 = h.ingest(
      Seq("""{"type_id":"u","data":{"id":"b","n":"not a number"}}""").toDF("message"),
      ingestTime = Some(t0))
    assert(r2.perType("u") === 0L && r2.quarantined === 1L)
    assert(h.table("u").count() === 1L)
    assert(spark.read.parquet(h.registry.quarantinePath("u")).count() === 1L)
    // FRESH type whose only batch writes no good rows (all payloads are
    // corrupt JSON, quarantined before validation): the write-created
    // empty dir must be removed — table existence stays DDL state
    import spark.implicits._
    val (n, q) = Ingest.ingestType(spark, h.registry, "vnew",
      Seq("not json", "{broken").toDS(), ingestTime = Some(t0))
    assert(n === 0L && q === 2L)
    assert(!new java.io.File(h.registry.tablePath("vnew")).exists(),
      "an all-quarantined FIRST batch must not leave a table dir behind")
  }
}

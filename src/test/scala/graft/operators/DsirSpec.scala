package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_dsir_weights is rows-only (ln drift — the q_lm_perplexity ruling), so
  * the formula is pinned here: an exact driver twin on a hand fixture
  * (word→bucket fetched from Spark's own xxhash64 so the twin shares the
  * hash), the target-vs-raw ordering property the score exists for, and
  * the zero-word / empty-corpus edges. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64 // small bucket count exercises collisions

  test("log-weight matches the exact driver twin on a hand fixture") {
    val docs = Seq(
      (1L, "alpha beta alpha", 1), // target
      (2L, "alpha gamma", 1),      // target
      (3L, "gamma delta delta", 0),
      (4L, "beta delta", 0)
    ).toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, "doc_id", "text",
        col("tgt") === 1, buckets = B)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()

    // word→bucket from Spark itself: the twin must share the exact hash
    val words = Map(
      1L -> Seq("alpha", "beta", "alpha"), 2L -> Seq("alpha", "gamma"),
      3L -> Seq("gamma", "delta", "delta"), 4L -> Seq("beta", "delta"))
    val vocab = words.values.flatten.toSeq.distinct
    val bucketOf = vocab.toDF("w")
      .select(col("w"), pmod(xxhash64(col("w")), lit(B)).as("b"))
      .as[(String, Long)].collect().toMap
    val tgtDocs = Set(1L, 2L)
    val ct = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cr = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    words.foreach { case (id, ws) =>
      ws.foreach { w =>
        if (tgtDocs(id)) ct(bucketOf(w)) += 1L else cr(bucketOf(w)) += 1L
      }
    }
    val denT = (ct.values.sum + B).toDouble
    val denR = (cr.values.sum + B).toDouble
    for ((id, ws) <- words.toSeq.sortBy(_._1)) {
      val logw = ws.groupBy(bucketOf).map { case (b, occ) =>
        occ.size * (math.log((ct(b) + 1) / denT) - math.log((cr(b) + 1) / denR))
      }.sum
      val expected = math.round(logw * 1e6)
      val row = got.find(_._1 == id).get
      assert(row._2 === ws.size.toLong, s"doc $id n_tokens")
      // ±1 micro-nat: partition-order summation vs the twin's fold
      assert(math.abs(row._3 - expected) <= 1L,
        s"doc $id logw: got ${row._3}, twin $expected")
    }
  }

  test("ordering: target-vocabulary docs score above raw-vocabulary docs") {
    val target = (1 to 20).map(i => (i.toLong, "quantum physics entropy", 1))
    val raw = (21 to 60).map(i => (i.toLong, "celebrity gossip rumor", 0))
    val probes = Seq((98L, "quantum entropy", 0), (99L, "gossip rumor", 0))
    val docs = (target ++ raw ++ probes).toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, "doc_id", "text", col("tgt") === 1)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(got(98L) > got(99L),
      s"target-like ${got(98L)} must beat raw-like ${got(99L)}")
  }

  test("zero-word docs keep a (0, 0) row") {
    val docs = Seq((1L, "some words", 1), (2L, "12345 !!!", 0))
      .toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, "doc_id", "text", col("tgt") === 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got(1) === ((2L, 0L, 0L)))
    assert(got(0)._2 === 2L)
  }

  test("an all-empty corpus yields all-zero rows, not a crash") {
    val docs = Seq((1L, "12345", 1), (2L, "!!!", 0)).toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, "doc_id", "text", col("tgt") === 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }
}

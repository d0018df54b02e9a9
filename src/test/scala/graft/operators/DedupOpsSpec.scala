package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate tests: each near-dup path must find a planted clone and
  * must not pair unrelated docs. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // base doc, a near-clone (one word changed), and two unrelated docs
  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val cloneDoc =
    "the quick brown fox jumps over the lazy cat near the quiet river bank today"
  private val other =
    "completely different content about spark engines and columnar execution plans"
  private val docs = Seq(
    (1L, base, "en", "s0"),
    (2L, cloneDoc, "en", "s0"),
    (3L, other, "en", "s0"),
    (4L, base, "en", "s0") // exact duplicate of 1
  ).toDF("doc_id", "text", "lang", "source")

  test("exact dedup groups identical texts with min-id keeper") {
    val r = DedupOps.exact(docs, "text", "doc_id")
      .orderBy("keeper_id").collect()
    assert(r.length === 3)
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper_id") === 1L)
  }

  test("jaccard near-dup finds the planted clone, not the unrelated doc") {
    val pairs = DedupOps.jaccardNearDups(docs, "doc_id", "text",
        Seq("lang", "source"), k = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((1L, 2L))) // clone found
    assert(pairSet.contains((1L, 4L))) // exact dup found (jac = 1.0)
    assert(!pairSet.exists { case (a, b) => a == 3L || b == 3L }) // no false pair
    val exact = pairs.find(r => (r.getLong(0), r.getLong(1)) == ((1L, 4L))).get
    assert(exact.getAs[Double]("jac") === 1.0)
  }

  test("minhash LSH finds the planted clone with exact-jaccard verification") {
    val pairs = DedupOps.minhashLshNearDups(docs, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))  // identical docs always share all bands
    assert(pairs.contains((1L, 2L)))  // high-jaccard clone caught by banding
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash hamming distance: 0 for identical, small for clone, large for unrelated") {
    val sigs = DedupOps.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(4L)) // identical text -> identical signature
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("shingles produce k-grams with set semantics") {
    val sh = docs.filter($"doc_id" === 1L)
      .select(DedupOps.shingles(col("text"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.contains("quick brown fox"))
    // 15 words -> 13 trigrams, minus dups ("the" appears 3x but trigrams distinct)
    assert(sh.length === 13)
  }
}

package graft.operators

import graft.SparkSpec

/** Behavioral contract of [[MultimodalOps.dhashDecontaminate]] on
  * constructed fingerprints: the Manku block-banding guarantee (every
  * Hamming ≤ 3 pair shares at least one 16-bit block), the exact verify,
  * and the hot-bucket cap. Complements the declared key's oracle gate,
  * which only sees the corpus's planted exact matches. */
class MultimodalDecontSpec extends SparkSpec {
  import spark.implicits._

  private def run(train: Seq[(Long, String)], ev: Seq[(Long, String)],
                  maxBucket: Int = Int.MaxValue) =
    MultimodalOps.dhashDecontaminate(
        train.toDF("doc_id", "dhash"), ev.toDF("doc_id", "dhash"),
        "doc_id", "dhash", maxDist = 3, maxBucket = maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("exact leak found at Hamming 0; unrelated hash not paired") {
    val got = run(
      train = Seq((1L, "00000000deadbeef"), (2L, "ffffffff12345678")),
      ev = Seq((100L, "00000000deadbeef")))
    assert(got === Set((100L, 1L, 0)))
  }

  test("3 bits in ONE block: found, exact distance") {
    // blocks: 0007 vs 0000 in block 0 — blocks 1..3 identical ⇒ banded
    val got = run(
      train = Seq((1L, "0000abcd1234ffff")),
      ev = Seq((100L, "0007abcd1234ffff")))
    assert(got === Set((100L, 1L, 3)))
  }

  test("3 bits spread over 3 blocks: the 4th identical block still bands it") {
    // one bit flipped in each of blocks 0,1,2 (MSB nibble 8 = one bit)
    val got = run(
      train = Seq((1L, "0000000000000000")),
      ev = Seq((100L, "8000800080000000")))
    assert(got === Set((100L, 1L, 3)))
  }

  test("4 bits, one per block: no shared block AND over maxDist — dropped") {
    val got = run(
      train = Seq((1L, "0000000000000000")),
      ev = Seq((100L, "8000800080008000")))
    assert(got === Set.empty[(Long, Long, Int)])
  }

  test("hot-bucket cap drops a degenerate block value before pairing") {
    // 2000 train docs all share every block with the eval doc; cap 100
    // keeps the banded join from materializing the hot cell
    val train = (1L to 2000L).map(i => (i, "0000000000000000"))
    val got = run(train, Seq((9999L, "0000000000000000")), maxBucket = 100)
    assert(got.isEmpty)
    val uncapped = run(train.take(5), Seq((9999L, "0000000000000000")))
    assert(uncapped.size === 5 && uncapped.forall(_._3 == 0))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Contracts of the PERSISTED lexical postings serving index (VERDICT r19
  * #1 — the lexical twin of the IVF/IVF-PQ indexes):
  *
  *  1. indexed ≡ computed, live: the declared [[Queries.qTextPostingsIndexed]]
  *     (staged token-bucket-partitioned index, literal bucket filter) must
  *     equal the computed postings ranker ([[Queries.lexPostingsTopN]])
  *     row-for-row — the equality the shared static oracle rests on;
  *  2. pruning is STRICT on a wide-vocabulary corpus: the declared
  *     documents table's 31-token vocabulary makes the bucket cut
  *     structural, so the scale claim — a few-token query reads a strict
  *     subset of the index's shards — is proven here on a constructed
  *     200-token corpus with a 2-token query;
  *  3. pruning is SOUND: the bucket-pruned serve equals the full-index
  *     serve on that corpus (every posting that can match a query token
  *     lives in that token's bucket — [[operators.TextOps.postingsBucket]]
  *     is ONE definition for the write and probe sides).
  */
class PostingsIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet

  test("declared indexed key equals the computed postings ranker") {
    val d = sf()
    val indexed = rows(Queries.qTextPostingsIndexed(spark, d))
    val computed = rows(Queries.lexPostingsTopN(spark, d, n = 10))
    assert(indexed === computed,
      "persisted postings index diverged from the computed ranker")
  }

  test("bucket pruning is strict and sound on a wide-vocabulary corpus") {
    import spark.implicits._
    val buckets = 32
    // 100 docs, each carrying 3 tokens out of a 200-token vocabulary —
    // wide enough that every bucket is populated, so a 2-token query's
    // bucket list is a strict subset of the shards on disk
    val docs = (0L until 100L).map { i =>
      (i, s"w${i * 2 % 200} w${(i * 2 + 1) % 200} w${(i * 7) % 200}")
    }.toDF("doc_id", "text")
    val post = operators.TextOps.docPostings(docs, "doc_id", "text")
    val idx = tmpDir("postings-index-spec")
    post.withColumn("bucket",
        operators.TextOps.postingsBucket(col("tok"), buckets))
      .write.partitionBy("bucket").mode("overwrite").parquet(idx)

    // external 2-token query (the production shape: queries are not rows
    // of the corpus) — doc_id -1 never collides with a corpus doc
    val qp = Seq((-1L, "w10"), (-1L, "w57"))
      .toDF("query_id", "tok")
    val qBuckets = qp
      .select(operators.TextOps.postingsBucket(col("tok"), buckets)
        .as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val allBuckets = spark.read.parquet(idx)
      .select("bucket").distinct().count()
    assert(qBuckets.size.toLong < allBuckets,
      s"expected a strict shard subset: query hits ${qBuckets.size} of " +
        s"$allBuckets populated buckets")

    val pruned = spark.read.parquet(idx)
      .filter(col("bucket").isin(qBuckets: _*)).select("doc_id", "tok")
    val full = spark.read.parquet(idx).select("doc_id", "tok")
    val servePruned = rows(
      operators.TextOps.postingsOverlapTopN(pruned, qp, n = 10))
    val serveFull = rows(
      operators.TextOps.postingsOverlapTopN(full, qp, n = 10))
    assert(servePruned === serveFull,
      "bucket-pruned serve diverged from the full-index serve")
    assert(servePruned.nonEmpty, "constructed query matched no documents")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join: the robust big-fact ⋉ selective-dim shape for a
  * 1000-executor cluster. Spark's own runtime-filter rule
  * (InjectRuntimeFilter) only fires under size/selectivity heuristics; this
  * operator makes the same plan explicit and unconditional:
  *
  *  1. one distributed aggregate over the dim keys builds a compact bloom
  *     sketch (bounded bytes — same order as a broadcast hashmap of keys,
  *     but ~10× smaller for the same membership question);
  *  2. the fact side is pre-filtered SCAN-SIDE with might_contain on the
  *     codegen'd xxhash64 of the key — before any exchange, so the join
  *     shuffles only surviving rows (false-positive rate ~3% default);
  *  3. an exact semi-join removes the false positives.
  *
  * Uses Spark's native BloomFilterAggregate / BloomFilterMightContain
  * expressions (the ones InjectRuntimeFilter itself plants) via the
  * graftbridge — codegen'd, no UDF in the hot path.
  */
object BloomJoin {

  /** Distributed bloom build over `dim`'s key column; bounded result bytes
    * on the driver (like a broadcast, but sketch-sized). Returns null iff
    * `dim` is empty — callers treat that as "nothing can match". */
  def keyBloom(dim: DataFrame, dimKey: String,
               expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(dimKey))), expectedItems)
      .toAggregateExpression()
    dim.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Scan-side membership predicate over the serialized bloom. A null
    * bloom (empty build side) yields a null predicate, which filters
    * everything — the correct empty-dim semantics. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Exact semi-join with a bloom pre-filter on the probe side. */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedItems)
    fact.filter(mightContain(bloom, col(factKey)))
      .join(dim.select(col(dimKey).as("__bloom_dim_key")),
        col(factKey) === col("__bloom_dim_key"), "left_semi")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers: pre-shuffle big fact tables ONCE at write time
  * so every subsequent equi-join/aggregation on the bucket key runs with no
  * exchange at all.
  *
  * This is the 100 TB play: a fact table joined daily on the same key should
  * not pay a multi-TB shuffle per query. Writing it bucketed (hash-
  * partitioned files + sorted within buckets) lets Catalyst plan
  * SortMergeJoin with NEITHER side shuffled — `requiredChildDistribution`
  * is already satisfied by the table layout. The same layout serves
  * bucket-local aggregation and bucket pruning on point predicates.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count —
    * planner produces a shuffle-free sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the executed plan contains no shuffle exchange — the
    * assertion that the bucket layout actually co-located the join. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: key salting for hot-key aggregations and joins.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * static fallback for pathological keys (a single key holding >1 partition
  * of data — the "null user_id" / "default tenant" shape every 100 TB
  * dataset has).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) —
    * spreading one hot key over `salts` reducers — then final-aggregate on
    * the key. Correct for any associative aggregate expressed as
    * (partialExpr, finalExpr) over the partial column. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))

  /** Salted broadcast-free join of a skewed fact against a dim: the fact
    * side gets a random-ish salt in [0, salts); the dim side is exploded
    * `salts`× so every (key, salt) bucket finds its dim row. Spreads a hot
    * fact key over `salts` tasks at the cost of replicating the dim. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}

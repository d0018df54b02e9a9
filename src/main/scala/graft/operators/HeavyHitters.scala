package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT heavy hitters (keys with frequency > n/k) at sketch cost — the
  * "which tokens/domains/urls dominate the corpus" primitive of a
  * training-data pipeline, where the distinct-key space (vocabulary,
  * hosts) is far too large to group-count outright but the answer set is
  * tiny and Zipf-headed. NULL keys are excluded throughout (from the
  * total n and from the output).
  *
  * Two corpus passes, both distributed:
  *  1. SKETCH — per-partition Misra–Gries with k counters
  *     (`mapPartitions`: genuinely imperative per-partition state, the
  *     documented last-resort case), emitting each partition's surviving
  *     candidate keys AND its row count in the same pass. MG's undercount
  *     error is bounded by n_p/(k+1), so any key with partition frequency
  *     > n_p/k survives its partition; and any key with GLOBAL frequency
  *     > n/k must exceed n_p/k in at least one partition (averaging
  *     argument) — the union of per-partition survivors is therefore a
  *     guaranteed superset of every true heavy hitter. At most
  *     (k+1)·partitions sketch rows ever leave the executors: the shuffle
  *     is sketch-sized, not vocabulary-sized. The sketch is
  *     localCheckpointed (sketch-sized, any corpus scale) so its two
  *     consumers — the total and the candidate set — share the one scan.
  *  2. EXACT — one more corpus scan counts ONLY rows whose key is in the
  *     broadcast candidate set (map-side semi-filter, then a hash
  *     aggregate over ≤ k·partitions distinct keys), filtered to
  *     count > n/k.
  *
  * The result is EXACT — same rows and counts as the full group-count —
  * which is what lets the DuckDB oracle hash it; freqItems / count-min
  * return approximate counts and could not sit under the hash gate.
  * At 100 TB: two scans + two sketch-sized shuffles vs one
  * vocabulary-sized shuffle; the scans are column-pruned to the key. */
object HeavyHitters {

  /** One corpus pass → (key, _np): candidate rows (key, 0) from each
    * partition's Misra–Gries survivors, plus one (NULL, partitionRows)
    * row per partition carrying the non-null row count. Materialized via
    * localCheckpoint — ≤ (k+1)·partitions rows at any corpus size. */
  private def sketch(keyed: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.as[String].mapPartitions { it =>
      // classic Misra–Gries: k counters; a miss with a full table
      // decrements every counter (amortized O(1): each decrement round
      // cancels k prior increments, so rounds ≤ n_p/k)
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var rows = 0L
      it.foreach { key =>
        rows += 1
        counters.get(key) match {
          case Some(c) => counters.update(key, c + 1)
          case None if counters.size < k => counters.update(key, 1L)
          case None =>
            val dead = List.newBuilder[String]
            counters.foreach { case (w, c) =>
              if (c == 1L) dead += w else counters.update(w, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator.map((_, 0L)) ++
        Iterator((null.asInstanceOf[String], rows))
    }.toDF(keyCol, "_np").localCheckpoint()
  }

  /** Distinct candidate keys from per-partition Misra–Gries sketches:
    * a superset of every (non-null) key with global frequency > n/k. */
  def candidates(df: DataFrame, keyCol: String, k: Int): DataFrame =
    sketch(df.select(col(keyCol).cast(StringType).as(keyCol))
        .filter(col(keyCol).isNotNull), keyCol, k)
      .filter(col(keyCol).isNotNull).select(keyCol).distinct()

  /** Exact keys + counts with frequency strictly greater than n/k, where
    * n counts the non-null keys. Output: (keyCol, n). */
  def exact(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull)
    val sk = sketch(keyed, keyCol, k)
    // 1-row aggregate over the sketch-sized frame (sum is NULL only on a
    // zero-partition frame — then the corpus is empty and so is the join)
    val totRow = sk.filter(col(keyCol).isNull)
      .agg(sum("_np")).collect()(0)
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val cand = sk.filter(col(keyCol).isNotNull).select(keyCol).distinct()
    // the threshold is a plain double on both engines (IEEE division of
    // exact integers — cross-engine identical)
    keyed
      .join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n").cast(DoubleType) > lit(total.toDouble / k))
  }
}

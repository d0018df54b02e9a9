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
  *  1. SKETCH — per-partition Misra–Gries with 4k counters
  *     (`mapPartitions`: genuinely imperative per-partition state, the
  *     documented last-resort case), emitting each partition's surviving
  *     (key, counter) pairs AND its row count in the same pass; at most
  *     (4k+1)·partitions sketch rows ever leave the executors. The
  *     partition sketches then TREE-MERGE through two weighted-MG folds
  *     (mergeable summaries, Agarwal et al. PODS'12) down to ≤ 4k
  *     candidates REGARDLESS of partition count — without the merge the
  *     candidate union is k·partitions, which at 10⁵ partitions is no
  *     longer broadcast-able. Undercount is additive per fold, total
  *     < 3n/(4k+1) < n/k, so every key with global frequency > n/k keeps
  *     a positive merged counter: the candidate set is a guaranteed
  *     superset of every true heavy hitter. The sketch is
  *     localCheckpointed (sketch-sized, any corpus scale) so its two
  *     consumers — the total and the candidate merge — share the one scan.
  *  2. EXACT — one more corpus scan counts ONLY rows whose key is in the
  *     broadcast ≤ 4k candidate set (map-side semi-filter, then a hash
  *     aggregate over the candidates), filtered to count > n/k.
  *
  * The result is EXACT — same rows and counts as the full group-count —
  * which is what lets the DuckDB oracle hash it; freqItems / count-min
  * return approximate counts and could not sit under the hash gate.
  * At 100 TB: two scans + two sketch-sized shuffles vs one
  * vocabulary-sized shuffle; the scans are column-pruned to the key. */
object HeavyHitters {

  /** Weighted Misra–Gries fold over (key, weight) pairs with `k`
    * counters — the MERGE step of the mergeable-summaries result
    * (Agarwal et al., PODS'12): summing sketches then re-pruning keeps
    * the undercount additive in the weight processed (≤ W/(k+1) per
    * fold). A miss with a full table inserts, then subtracts the new
    * minimum from every counter and drops zeros. */
  private def mgFold(it: Iterator[(String, Long)],
                     k: Int): Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { case (key, w) =>
      counters.get(key) match {
        case Some(c) => counters.update(key, c + w)
        case None if counters.size < k => counters.update(key, w)
        case None =>
          counters.update(key, w)
          val m = counters.valuesIterator.min
          // in-place transforms (mutating inside foreach is undefined
          // behavior for mutable.HashMap)
          counters.mapValuesInPlace((_, c) => c - m)
          counters.filterInPlace((_, c) => c > 0)
      }
    }
    counters.iterator
  }

  /** One corpus pass → (key, _np): candidate rows carrying their MG
    * counter value (a lower bound on partition frequency) from each
    * partition's sketch, plus one (NULL, partitionRows) row per
    * partition with the non-null row count. Materialized via
    * localCheckpoint — ≤ (k+1)·partitions rows at any corpus size. */
  private def sketch(keyed: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.as[String].mapPartitions { it =>
      // amortized O(1) per row: each decrement round cancels k prior
      // increments, so rounds ≤ n_p/k
      var rows = 0L
      val folded = mgFold(it.map { key => rows += 1; (key, 1L) }, k)
      folded ++ Iterator((null.asInstanceOf[String], rows))
    }.toDF(keyCol, "_np").localCheckpoint()
  }

  /** Distinct candidate keys — a superset of every (non-null) key with
    * global frequency > n/k, AT MOST 4k keys regardless of partition
    * count: the per-partition sketches (internal size 4k) tree-merge
    * through two weighted-MG folds (≤ 32 intermediate sketches, then
    * one), so the total undercount is < 3n/(4k+1) < n/k and every true
    * heavy hitter keeps a positive merged counter. Without the merge the
    * candidate union is k·partitions — at 10⁵ partitions no longer a
    * broadcast; with it the exact pass always broadcasts O(k) keys. */
  def candidates(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val kk = 4 * k
    mergeSketches(sketch(df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull), keyCol, kk), keyCol, kk)
      .filter(col(keyCol).isNotNull).select(keyCol).distinct()
  }

  /** Tree-merge a [[sketch]]'s candidate rows down to ≤ kk weighted keys
    * (two weighted-MG folds: ≤ 32 intermediate sketches, then one),
    * carrying the (NULL, rowCount) total rows through summed — the
    * output is itself a mergeable sketch STATE in the same (key, _np)
    * shape, which is what the streaming maintenance folds forward. */
  private[graft] def mergeSketches(sk: DataFrame, keyCol: String,
                                   kk: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val merged = sk.filter(col(keyCol).isNotNull)
      .as[(String, Long)]
      .repartition(32).mapPartitions(mgFold(_, kk))
      .repartition(1).mapPartitions(mgFold(_, kk))
      .toDF(keyCol, "_np")
    val totRow = sk.filter(col(keyCol).isNull).agg(sum("_np")).collect()(0)
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    merged.unionByName(
      Seq((null.asInstanceOf[String], total)).toDF(keyCol, "_np"))
  }

  /** Mergeable sketch STATE of a key column — ≤ 4k (key, weight) rows
    * plus one (NULL, rowCount) total row. [[mergeStates]] folds two of
    * these; [[exactFromState]] finishes with the exact pass. The
    * streaming-maintenance unit: per micro-batch cost is one batch scan
    * + sketch-sized shuffles, state is O(k) at rest. */
  private[graft] def sketchState(df: DataFrame, keyCol: String,
                                 k: Int): DataFrame =
    mergeSketches(sketch(df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull), keyCol, 4 * k), keyCol, 4 * k)

  /** Fold two sketch states (each ≤ 4k+1 rows): weighted-MG over the
    * union's candidate rows, totals summed. Each fold an element's
    * counters pass through adds ≤ weight/(4k+1) undercount; with B
    * micro-batches the longest path is partition→tree(2)→(B−1) state
    * merges, so the superset guarantee (total undercount < n/k) holds
    * for B ≤ k/(k−1)+2 ≈ 3 at internal size 4k — callers folding more
    * batches should raise k (the declared run uses B=2). */
  private[graft] def mergeStates(a: DataFrame, b: DataFrame, keyCol: String,
                                 k: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val kk = 4 * k
    val cand = a.unionByName(b).filter(col(keyCol).isNotNull)
      .as[(String, Long)]
      .repartition(1).mapPartitions(mgFold(_, kk))
      .toDF(keyCol, "_np")
    val tot = a.unionByName(b).filter(col(keyCol).isNull)
      .agg(coalesce(sum("_np"), lit(0L))).collect()(0).getLong(0)
    cand.unionByName(
      Seq((null.asInstanceOf[String], tot)).toDF(keyCol, "_np"))
  }

  /** The exact finishing pass against a corpus at rest, driven by a
    * sketch state's candidates + total: identical output to [[exact]]
    * whenever the state's undercount budget held (see [[mergeStates]]). */
  private[graft] def exactFromState(df: DataFrame, state: DataFrame,
                                    keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull)
    val totRow = state.filter(col(keyCol).isNull)
      .agg(coalesce(sum("_np"), lit(0L))).collect()(0)
    val total = totRow.getLong(0)
    val cand = state.filter(col(keyCol).isNotNull).select(keyCol).distinct()
    keyed
      .join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n").cast(DoubleType) > lit(total.toDouble / k))
  }

  /** Exact keys + counts with frequency strictly greater than n/k, where
    * n counts the non-null keys. Output: (keyCol, n). */
  def exact(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull)
    val kk = 4 * k // internal sketch size: keeps the tree-merged
    // undercount < 3n/(4k+1) < n/k, preserving the superset guarantee.
    // (The threshold inside exactFromState is a plain double on both
    // engines — IEEE division of exact integers, cross-engine identical.)
    val sk = sketch(keyed, keyCol, kk)
    exactFromState(keyed, mergeSketches(sk, keyCol, kk), keyCol, k)
  }
}

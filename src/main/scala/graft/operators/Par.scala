package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit scale-adaptive fan-out for CPU-heavy per-row kernels (r22,
  * guide §2 — partitions sized to the WORK, not just the bytes).
  *
  * A single-file parquet scan is ONE input partition, and every narrow
  * stage downstream of it (fixed-point LSH bucket bits, MinHash/SimHash
  * signature arrays, codebook assignment) inherits that single task no
  * matter how many cores the session has: nothing in the planner widens
  * map-side work, and AQE only ever COALESCES post-shuffle partitions —
  * by BYTES, which a per-row kernel's CPU cost is invisible to. Measured
  * r22 (sf0.1, local[32], warm traces): the fixed-grid bucket kernel ran
  * 645 ms on one task inside q_vec_knn_graph_lsh, 430 ms inside
  * q_vec_ann_lsh_fixed, the MinHash/SimHash signature builds 242/243 ms —
  * all serial on a 32-core host.
  *
  * `fanOut` inserts an explicit hash repartition on `key` to the
  * session's shuffle parallelism AHEAD of the kernel. Explicit
  * repartitions are exempt from AQE coalescing; the shuffled rows are the
  * narrow pre-kernel projection (ids + vectors/text), so the exchange is
  * a few MB; and every gated consumer is partitioning-invariant by
  * construction (fixed-point grids, total-order tie-breaks —
  * PartitionInvarianceSpec sweeps the inventory), so declared outputs are
  * unchanged. At 100 TB the input is many files/splits and the
  * repartition is a cheap near-no-op rebalance of already-wide scans. */
private[graft] object Par {
  /** Explicit hash fan-out — use ONLY where the plan already needs a
    * shuffle with this clustering (the pair dedup's aggregate, a window's
    * required distribution): the explicit exchange REPLACES the
    * EnsureRequirements one (hash on a subset of the clustering keys
    * satisfies ClusteredDistribution), so no shuffle is added at any
    * scale — it just pins the key and the partition count so AQE cannot
    * coalesce a CPU-heavy skinny-row stage down to one task, and a
    * downstream join/agg clustered on the same key reuses it. */
  def fanOut(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)

  /** Conditional fan-out for NARROW SOURCES feeding heavy per-row kernels
    * (LSH bucket bits, signature arrays, codebook assignment): only
    * repartitions when the frame's physical partition count sits below
    * the session parallelism — the 1-file local-bench scan, where the
    * kernel would otherwise run as ONE task on a 32-core host. At 100 TB
    * the input is many splits, the guard sees a wide frame, and NO
    * exchange is inserted — the corpus never pays an extra network pass
    * for a defect it doesn't have. Only call this on scan/project frames
    * (no upstream exchange), where the partition count is known without
    * executing anything. */
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n, keys: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-drift statistics for data-quality monitoring — "did this
  * week's data shift vs last week's?" is the first question a 100 TB
  * ingestion pipeline has to answer before training on the new slice.
  *
  * Everything here is EXACT integer arithmetic over counts, so results are
  * bit-identical across engines, runs, and partitionings and sit under the
  * DuckDB oracle hash gate (a float ECDF difference would drift in the
  * last ulp and never hash equal).
  */
object StatsOps {

  /** Exact two-sample Kolmogorov–Smirnov statistic per comparison group —
    * the classic distribution-shift alarm: D = max_x |F_A(x) − F_B(x)|
    * between the empirical CDFs of two subsamples of `valueCol`.
    *
    * All arithmetic stays integer by cross-multiplying: at every observed
    * value v with cumulative counts c_A, c_B and totals t_A, t_B,
    * |F_A − F_B| = |c_A·t_B − c_B·t_A| / (t_A·t_B) — the returned `ks_num`
    * is the max numerator and D = ks_num / (n_a·n_b) exactly. `ks_ppm` is
    * a convenience: each ECDF floored onto a parts-per-million grid
    * (⌊c·10⁶/t⌋) before the max-abs-diff, so it is itself exact integer
    * arithmetic (within 2 ppm of true D·10⁶) with headroom to ~9·10¹²
    * rows per side; `ks_num`'s cross products need t_A·t_B < 2⁶³
    * (~3·10⁹ rows per side) — beyond that read `ks_ppm` only, or
    * pre-aggregate onto a coarser grid.
    *
    * Plan shape (scale-honest): one hash agg collapses the corpus to
    * per-(group, value) count pairs — the window cumsum then runs over
    * DISTINCT values only, not rows. For real-valued metrics whose
    * distinct count approaches the row count, set `gridScale` > 0 to
    * first floor values onto an integer grid v = ⌊value·gridScale⌋
    * (KS of the binned distributions, still exact and deterministic:
    * one IEEE double product + floor is cross-engine identical); the
    * window's partition size is then bounded by the value range × grid,
    * independent of corpus size.
    *
    * Degenerate groups (one sample empty): ks_num is 0 by the formula's
    * vacuous cross products; ks_ppm is pinned at 10⁶ (total drift) so an
    * empty side is loudly visible rather than silently "no drift".
    *
    * @param isSampleB boolean Column splitting rows into sample A (false)
    *                  and sample B (true)
    * @return one row per comparison group: (cmpCol, n_a, n_b, ks_num,
    *         ks_ppm), all counts BIGINT
    */
  /** Exact TOTAL-VARIATION distance per comparison group — the categorical
    * companion to [[ksStatistic]]: for an UNORDERED column (language,
    * source, event type, label) drift is the mix shift
    * TV = ½ Σ_c |P_A(c) − P_B(c)|, and an ECDF statistic does not apply.
    *
    * Same integer discipline: per category c with counts o_A, o_B and
    * totals t_A, t_B, the summand is |o_A·t_B − o_B·t_A| / (t_A·t_B) —
    * `tv_num` = Σ_c |o_A·t_B − o_B·t_A| is exact and TV =
    * tv_num / (2·n_a·n_b). `tv_ppm` floors each category's probabilities
    * onto the ppm grid first (Σ_c |⌊o_A·10⁶/t_A⌋ − ⌊o_B·10⁶/t_B⌋| ÷ 2),
    * so it is exact integer arithmetic within C ppm of true TV·10⁶ for C
    * categories, with ~9·10¹²-row headroom; `tv_num` needs t_A·t_B < 2⁶³.
    * Empty side: tv_ppm pinned at 10⁶, same contract as ksStatistic.
    *
    * Plan: ONE hash agg to per-(group, category) counts, one tiny agg to
    * group totals — no window at all, so unordered high-cardinality
    * columns cost a groupBy and nothing else. */
  def tvDistance(df: DataFrame, cmpCol: String, isSampleB: Column,
                 valueCol: String): DataFrame = {
    val counts = df
      .select(col(cmpCol).as("__cmp"), col(valueCol).as("__v"),
        when(isSampleB, lit(1L)).otherwise(lit(0L)).as("__s"))
      .groupBy("__cmp", "__v")
      .agg(sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("oa"),
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("ob"))
    val wAll = Window.partitionBy("__cmp")
    counts
      .withColumn("ta", sum("oa").over(wAll))
      .withColumn("tb", sum("ob").over(wAll))
      .groupBy(col("__cmp").as(cmpCol))
      .agg(
        max("ta").cast(LongType).as("n_a"),
        max("tb").cast(LongType).as("n_b"),
        sum(abs(col("oa") * col("tb") - col("ob") * col("ta")))
          .cast(LongType).as("tv_num"),
        when(max("ta") > 0L && max("tb") > 0L,
          // greatest() guards ANSI div-by-zero on the pinned branch only
          expr("sum(abs((oa * 1000000L) div greatest(ta, 1L) - " +
            "(ob * 1000000L) div greatest(tb, 1L))) div 2"))
          .otherwise(lit(1000000L)).cast(LongType).as("tv_ppm"))
  }

  /** Per-group OLS TREND — least-squares slope/intercept of `valueCol`
    * over `tsCol` per group, the trend companion to [[ksStatistic]]'s
    * shift alarm. Exact-sum construction: x = whole seconds since
    * `offsetMicros` (pre-data epoch ⇒ non-negative ⇒ truncating div ==
    * floor div), y on the integer micro-grid (scale-0 round — the
    * cross-engine-safe one), all five sufficient statistics summed
    * exactly (product sums in DECIMAL(38), mirroring the oracle's
    * HUGEINT), then one shared IEEE tree finishes the closed form. One
    * hash agg — the mergeable-moments shape.
    *
    * @return (groupCol, n, slope_uv_day, intercept_uv): slope in
    *         micro-value units per day, intercept in micro-value units
    *         at the offset epoch
    */
  def olsTrend(df: DataFrame, groupCol: String, tsCol: String,
               valueCol: String,
               offsetMicros: Long = 1577836800000000L): DataFrame =
    olsFinish(olsCounts(df, groupCol, tsCol, valueCol, offsetMicros), groupCol)

  /** The MERGEABLE half of [[olsTrend]]: per-group exact sufficient
    * statistics (n, sx, sy, sxy, sxx). Moments merge by union + sum —
    * a streaming monitor folds one of these per micro-batch into O(groups)
    * standing state and finishes with [[olsFinish]] at any point;
    * fold-then-finish equals one-shot by associativity of +. */
  def olsCounts(df: DataFrame, groupCol: String, tsCol: String,
                valueCol: String,
                offsetMicros: Long = 1577836800000000L): DataFrame = {
    val Dec38 = DecimalType(38, 0)
    df.select(col(groupCol),
        expr(s"(unix_micros($tsCol) - ${offsetMicros}L) div 1000000").as("xs"),
        round(col(valueCol) * lit(1e6)).cast(LongType).as("ym"))
      .groupBy(groupCol).agg(
        count(lit(1)).as("n"),
        sum("xs").as("sx"),
        sum("ym").as("sy"),
        sum((col("xs") * col("ym")).cast(Dec38)).as("sxy"),
        sum((col("xs") * col("xs")).cast(Dec38)).as("sxx"))
  }

  /** Merge two [[olsCounts]] states (union + per-group sum). */
  def olsMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(groupCol).agg(
      sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
      sum("sxy").as("sxy"), sum("sxx").as("sxx"))

  /** The finishing half of [[olsTrend]]: one shared IEEE closed-form tree
    * over exact sums, scale-0 rounds. */
  def olsFinish(counts: DataFrame, groupCol: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val slopeRaw = (dbl(col("n")) * dbl(col("sxy")) -
        dbl(col("sx")) * dbl(col("sy"))) /
      (dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")))
    counts.select(col(groupCol), col("n"),
      round(slopeRaw * lit(86400.0)).cast(LongType).as("slope_uv_day"),
      round(dbl(col("sy")) / dbl(col("n")) -
        slopeRaw * (dbl(col("sx")) / dbl(col("n"))))
        .cast(LongType).as("intercept_uv"))
  }

  def ksStatistic(df: DataFrame, cmpCol: String, isSampleB: Column,
                  valueCol: String, gridScale: Long = 0L): DataFrame =
    ksFromCounts(ksCounts(df, cmpCol, isSampleB, valueCol, gridScale), cmpCol)

  /** The MERGEABLE half of [[ksStatistic]]: per-(group, value) two-sample
    * counts (__cmp, __v, na, nb). Counts merge by union + sum — the
    * simplest mergeable summary — so a streaming monitor can fold one of
    * these per micro-batch into O(groups × grid) standing state and
    * finish with [[ksFromCounts]] at any point; fold-then-finish equals
    * one-shot by associativity of +. */
  def ksCounts(df: DataFrame, cmpCol: String, isSampleB: Column,
               valueCol: String, gridScale: Long = 0L): DataFrame = {
    val v =
      if (gridScale > 0L)
        floor(col(valueCol).cast(DoubleType) * lit(gridScale.toDouble))
          .cast(LongType)
      else col(valueCol)
    df.select(col(cmpCol).as("__cmp"), v.as("__v"),
        when(isSampleB, lit(1L)).otherwise(lit(0L)).as("__s"))
      .groupBy("__cmp", "__v")
      .agg(sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("na"),
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("nb"))
  }

  /** Merge two [[ksCounts]] states (union + per-key sum). */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("__cmp", "__v")
      .agg(sum("na").as("na"), sum("nb").as("nb"))

  /** The finishing half of [[ksStatistic]] over a [[ksCounts]] state. */
  def ksFromCounts(counts: DataFrame, cmpCol: String): DataFrame = {
    val wCum = Window.partitionBy("__cmp").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("__cmp")
    counts
      .withColumn("ca", sum("na").over(wCum))
      .withColumn("cb", sum("nb").over(wCum))
      .withColumn("ta", max(col("ca")).over(wAll)) // cumsum's last value
      .withColumn("tb", max(col("cb")).over(wAll))
      .groupBy(col("__cmp").as(cmpCol))
      .agg(
        max("ca").cast(LongType).as("n_a"),
        max("cb").cast(LongType).as("n_b"),
        max(abs(col("ca") * col("tb") - col("cb") * col("ta")))
          .cast(LongType).as("ks_num"),
        when(max("ca") > 0L && max("cb") > 0L,
          // non-negative operands: Spark div == DuckDB //; greatest(t,1)
          // only guards ANSI div-by-zero on an empty side, where the
          // numerator is identically 0 and the WHEN pins the result anyway
          max(abs(expr("(ca * 1000000L) div greatest(ta, 1L)") -
            expr("(cb * 1000000L) div greatest(tb, 1L)"))))
          .otherwise(lit(1000000L)).cast(LongType).as("ks_ppm"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver replay of the cross-multiplied integer KS. */
  private def bruteKs(a: Seq[Double], b: Seq[Double]): (Long, Long, Long, Long) = {
    val (na, nb) = (a.size.toLong, b.size.toLong)
    if (na == 0 || nb == 0) return (na, nb, 0L, 1000000L)
    val vs = (a ++ b).distinct.sorted
    val diffs = vs.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      (math.abs(ca * nb - cb * na),
        math.abs(ca * 1000000L / na - cb * 1000000L / nb))
    }
    (na, nb, diffs.map(_._1).max, diffs.map(_._2).max)
  }

  private def run(rows: Seq[(String, Double, Boolean)], grid: Long = 0L) =
    StatsOps.ksStatistic(rows.toDF("g", "value", "b"), "g", col("b"),
        "value", gridScale = grid)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("ksStatistic matches the driver replay on a shifted fixture") {
    val a = (1 to 10).map(_.toDouble)
    val b = (6 to 15).map(_.toDouble)
    val rows = a.map(("x", _, false)) ++ b.map(("x", _, true))
    val got = run(rows)("x")
    assert(got === bruteKs(a, b))
    // 5 of 10 observations shifted past the other sample: D = 1/2 exactly
    assert(got._3 === 50L && got._4 === 500000L)
  }

  test("ksStatistic: identical samples score 0, disjoint samples score max") {
    val same = (1 to 8).map(_.toDouble)
    val gotSame = run(same.map(("s", _, false)) ++ same.map(("s", _, true)))("s")
    assert(gotSame._3 === 0L && gotSame._4 === 0L)
    val a = (1 to 5).map(_.toDouble)
    val b = (11 to 15).map(_.toDouble)
    val gotDisj = run(a.map(("d", _, false)) ++ b.map(("d", _, true)))("d")
    assert(gotDisj._3 === 25L) // na*nb: the CDFs separate completely
    assert(gotDisj._4 === 1000000L)
  }

  test("ksStatistic: random fixtures match the replay; groups independent") {
    val rnd = new scala.util.Random(29)
    val byG = (0 until 3).map { g =>
      val a = Seq.fill(20 + rnd.nextInt(30))((rnd.nextInt(40) + 1).toDouble)
      val b = Seq.fill(20 + rnd.nextInt(30))((rnd.nextInt(40) + 5).toDouble)
      s"g$g" -> (a, b)
    }.toMap
    val rows = byG.toSeq.flatMap { case (g, (a, b)) =>
      a.map((g, _, false)) ++ b.map((g, _, true))
    }
    val got = run(rows)
    for ((g, (a, b)) <- byG)
      assert(got(g) === bruteKs(a, b), s"group $g diverged")
  }

  test("ksStatistic: an empty side pins ks_ppm at 1e6, loudly") {
    val got = run((1 to 6).map(i => ("e", i.toDouble, false)))("e")
    assert(got === ((6L, 0L, 0L, 1000000L)))
  }

  /** Driver replay of the per-category cross-multiplied TV. */
  private def bruteTv(a: Seq[String], b: Seq[String]): (Long, Long, Long, Long) = {
    val (na, nb) = (a.size.toLong, b.size.toLong)
    if (na == 0 || nb == 0) return (na, nb, 0L, 1000000L)
    val cats = (a ++ b).distinct
    val terms = cats.map { c =>
      val (oa, ob) = (a.count(_ == c).toLong, b.count(_ == c).toLong)
      (math.abs(oa * nb - ob * na),
        math.abs(oa * 1000000L / na - ob * 1000000L / nb))
    }
    (na, nb, terms.map(_._1).sum, terms.map(_._2).sum / 2)
  }

  private def runTv(rows: Seq[(String, String, Boolean)]) =
    StatsOps.tvDistance(rows.toDF("g", "v", "b"), "g", col("b"), "v")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("tvDistance matches the driver replay; identical and disjoint mixes") {
    val a = Seq("en", "en", "en", "de")
    val b = Seq("en", "de", "de", "zh")
    val got = runTv(a.map(("m", _, false)) ++ b.map(("m", _, true)))("m")
    assert(got === bruteTv(a, b))
    // identical mixes: zero drift
    val same = Seq("x", "x", "y")
    val gotSame = runTv(same.map(("s", _, false)) ++ same.map(("s", _, true)))("s")
    assert(gotSame._3 === 0L && gotSame._4 === 0L)
    // disjoint supports: TV = 1 exactly — tv_num = 2·na·nb
    val gotDisj = runTv(Seq(("d", "p", false), ("d", "p", false),
      ("d", "q", true)))("d")
    assert(gotDisj._3 === 2L * 2L * 1L && gotDisj._4 === 1000000L)
  }

  test("tvDistance: random mixes match the replay per group; empty side pins") {
    val rnd = new scala.util.Random(31)
    val langs = Seq("en", "de", "fr", "es", "zh")
    val byG = (0 until 3).map { g =>
      val a = Seq.fill(15 + rnd.nextInt(25))(langs(rnd.nextInt(langs.size)))
      val b = Seq.fill(15 + rnd.nextInt(25))(langs(rnd.nextInt(3)))
      s"g$g" -> (a, b)
    }.toMap
    val rows = byG.toSeq.flatMap { case (g, (a, b)) =>
      a.map((g, _, false)) ++ b.map((g, _, true))
    }
    val got = runTv(rows)
    for ((g, (a, b)) <- byG) assert(got(g) === bruteTv(a, b), s"group $g")
    assert(runTv(Seq(("e", "x", true)))("e") === ((0L, 1L, 0L, 1000000L)))
  }

  test("olsTrend recovers an exact line: slope and intercept to the micro-unit") {
    val off = 1577836800000000L
    // value = 2·t + 5 (t in seconds past the offset): slope 2 uv/sec =
    // 172_800_000_000 uv/day, intercept 5_000_000 uv — both exact
    val rows = (0 to 9).map { k =>
      ("a", new java.sql.Timestamp((off + k * 1000000L) / 1000L),
        2.0 * k + 5.0)
    }
    val got = StatsOps.olsTrend(rows.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect()(0)
    assert(got.getAs[Long]("n") === 10L)
    assert(got.getAs[Long]("slope_uv_day") === 172800000000L)
    assert(got.getAs[Long]("intercept_uv") === 5000000L)
  }

  test("olsTrend matches a driver least-squares replay on noisy groups") {
    val off = 1577836800000000L
    val rnd = new scala.util.Random(5)
    val data = for (g <- Seq("p", "q"); k <- 0 until 40) yield {
      val t = k * 3600L // hourly points
      val v = (if (g == "p") 0.5 * k else -0.2 * k) + rnd.nextInt(100) / 10.0
      (g, new java.sql.Timestamp((off + t * 1000000L) / 1000L), v)
    }
    val got = StatsOps.olsTrend(data.toDF("g", "ts", "v"), "g", "ts", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("slope_uv_day"), r.getAs[Long]("intercept_uv"))).toMap
    for (g <- Seq("p", "q")) {
      // twin on the SAME integer grid the operator uses
      val pts = data.filter(_._1 == g)
        .map(t => ((t._2.getTime * 1000L - off) / 1000000L,
          math.round(t._3 * 1e6)))
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
      val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
      val sxx = pts.map(p => p._1.toDouble * p._1.toDouble).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val want = (math.round(slope * 86400.0), math.round(sy / n - slope * (sx / n)))
      val (gs, gi) = got(g)
      assert(math.abs(gs - want._1) <= 1L, s"$g slope $gs vs ${want._1}")
      assert(math.abs(gi - want._2) <= 1L, s"$g intercept $gi vs ${want._2}")
    }
  }

  test("ksStatistic: gridScale bins values before the comparison") {
    // distinct at full precision, identical on the 10^1 grid
    val rows = Seq(("q", 1.01, false), ("q", 1.04, true),
      ("q", 2.52, false), ("q", 2.58, true))
    assert(run(rows)("q")._3 === 2L) // raw doubles interleave: 1.01<1.04
    assert(run(rows, grid = 10L)("q")._3 === 0L) // ⌊v·10⌋ merges each pair
  }
}

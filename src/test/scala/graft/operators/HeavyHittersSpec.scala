package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish fixture: key i appears ceil(600 / i) times, i in 1..60 —
    * a heavy head (key 1: 600, key 2: 300, …) over a long tail; spread
    * across 4 partitions in interleaved order so per-partition MG sketches
    * see every key. */
  private def zipfKeys: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill((600 + i - 1) / i)(s"k$i"))

  private def truth(rows: Seq[String], k: Int): Map[String, Long] = {
    val n = rows.size
    rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c.toDouble > n.toDouble / k }.toMap
  }

  test("exact() equals group-count-having ground truth on a Zipf head") {
    val rows = new scala.util.Random(7).shuffle(zipfKeys)
    val df = rows.toDF("key").repartition(4)
    for (k <- Seq(5, 20, 50)) {
      val got = HeavyHitters.exact(df, "key", k)
        .as[(String, Long)].collect().toMap
      assert(got === truth(rows, k), s"k=$k")
    }
  }

  test("candidates() is a superset of every true heavy hitter") {
    val rows = new scala.util.Random(13).shuffle(zipfKeys)
    val df = rows.toDF("key").repartition(4)
    for (k <- Seq(3, 10, 40)) {
      val cand = HeavyHitters.candidates(df, "key", k)
        .as[String].collect().toSet
      val heavy = truth(rows, k).keySet
      assert(heavy.subsetOf(cand),
        s"k=$k missing ${heavy -- cand}")
      // the tree-merged candidate set is ≤ 4k at ANY partition count
      assert(cand.size <= k * 4, s"k=$k candidates=${cand.size}")
    }
  }

  test("candidate bound and superset hold at high partition counts") {
    // the 100 TB shape: many partitions would make the UNMERGED candidate
    // union k·partitions; the weighted-MG tree-merge must keep it ≤ 4k
    // while every true heavy hitter survives the merged undercount
    val rows = new scala.util.Random(99).shuffle(zipfKeys)
    val df = rows.toDF("key").repartition(64)
    for (k <- Seq(3, 8)) {
      val cand = HeavyHitters.candidates(df, "key", k)
        .as[String].collect().toSet
      assert(cand.size <= 4 * k, s"k=$k candidates=${cand.size} > 4k")
      val heavy = truth(rows, k).keySet
      assert(heavy.subsetOf(cand), s"k=$k missing ${heavy -- cand}")
      val got = HeavyHitters.exact(df, "key", k)
        .as[(String, Long)].collect().toMap
      assert(got === truth(rows, k), s"k=$k exact mismatch")
    }
  }

  test("sketch-state fold over random splits equals one-shot exact") {
    // the mergeable-summaries property behind the streaming maintenance:
    // sketchState per slice, mergeStates fold, exactFromState finish —
    // must equal exact() over the whole corpus for any 2-way split
    val rnd = new scala.util.Random(21)
    val rows = rnd.shuffle(zipfKeys)
    val whole = rows.toDF("key").repartition(4)
    for (trial <- 1 to 3) {
      val cut = rnd.nextInt(rows.size)
      val (ra, rb) = rows.splitAt(cut)
      val k = Seq(5, 20, 50)(trial % 3)
      val sa = HeavyHitters.sketchState(ra.toDF("key").repartition(3), "key", k)
      val sb = HeavyHitters.sketchState(rb.toDF("key").repartition(3), "key", k)
      val folded = HeavyHitters.mergeStates(sa, sb, "key", k)
      val got = HeavyHitters.exactFromState(whole, folded, "key", k)
        .as[(String, Long)].collect().toMap
      assert(got === truth(rows, k), s"trial=$trial cut=$cut k=$k")
    }
  }

  test("k=2 majority element survives adversarial interleaving") {
    // a,b,a,c,a,d,… — every non-a arrival triggers a decrement round;
    // the majority element must still come out exactly counted
    val rows = (1 to 500).flatMap(i => Seq("a", s"x$i")) ++ Seq.fill(2)("a")
    val df = rows.toDF("key").repartition(3)
    val got = HeavyHitters.exact(df, "key", 2).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 502L)))
  }

  test("null keys are excluded from both the total and the output") {
    // 600 nulls + 400 "a": with nulls excluded n=400, so "a" (400 > 200)
    // is a heavy hitter at k=2 — counting nulls into n would wrongly
    // report nothing (threshold 500)
    val rows: Seq[Option[String]] =
      Seq.fill(600)(None) ++ Seq.fill(400)(Some("a"))
    val df = rows.toDF("key").repartition(4)
    val got = HeavyHitters.exact(df, "key", 2).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 400L)))
  }

  test("declared-config run over document tokens matches group-count") {
    val docs = graft.Tables.documents(spark, sf())
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val n = words.count()
    val expected = words.groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n").cast("double") > lit(n.toDouble / 200))
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.exact(words, "word", 200)
      .as[(String, Long)].collect().toMap
    assert(got === expected)
    assert(got.nonEmpty) // the fixture has a Zipf head
  }
}

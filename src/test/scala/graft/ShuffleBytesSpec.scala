package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** MEASURED shuffle-volume contracts — the scale claims as numbers, not
  * plan shapes: PlanContractSpec pins WHAT the plans do; this spec pins
  * HOW MUCH actually moves. A stage listener sums shuffle-write bytes
  * across every job an action triggers, so the assertions hold whatever
  * Catalyst does to the plan. Relative bounds (sketch vs full shuffle on
  * the SAME data) keep them robust to fixture size. */
class ShuffleBytesSpec extends SparkSpec {

  /** Total shuffle-write bytes across the stages triggered by `act` —
    * scoped by JOB GROUP, because sbt runs suites concurrently in one
    * JVM and a global stage sum would count other suites' shuffles
    * (AQE's materialization jobs propagate local properties, so they
    * carry the group too; broadcast-collect jobs may not, but broadcast
    * stages write no shuffle). */
  private val tagSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def shuffleWrite(act: => Unit): Long = {
    val tag = s"graft-shuffle-bytes-${tagSeq.incrementAndGet()}"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null &&
            tag == js.properties.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(id => stages.add(id))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (stages.contains(sc.stageInfo.stageId))
          bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
      act
      // listener events are posted asynchronously; drain before reading
      org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext, 30000)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
    bytes.get()
  }

  test("heavy-hitters shuffles a sketch, not the key space") {
    // high-cardinality fixture — the regime the sketch exists for
    // (key space >> answer): 5 heavy keys at 20k rows each interleaved
    // with 100k singletons, fully deterministic
    val df = spark.range(200000).selectExpr(
      "CASE WHEN id % 2 = 0 THEN concat('h', id % 10) " +
        "ELSE concat('u', id) END AS word")
    // full group-count: all ~100k distinct keys cross the wire (map-side
    // combined, but still key-space-sized); noop sink forces the full
    // result without a count-only plan rewrite
    val full = shuffleWrite {
      df.groupBy("word").count()
        .write.format("noop").mode("overwrite").save()
    }
    // sketch path: MG candidates (≤ (k+1)·partitions rows) + the exact
    // recount restricted to the broadcast candidate set
    val sketch = shuffleWrite {
      operators.HeavyHitters.exact(df, "word", 20)
        .write.format("noop").mode("overwrite").save()
    }
    // and the answer itself stays exact on this fixture
    assert(operators.HeavyHitters.exact(df, "word", 20).count() === 5)
    assert(full > 0, "expected the baseline group-count to shuffle")
    assert(sketch < full / 4,
      s"sketch path shuffled $sketch B vs full group-count $full B — " +
        "expected < 25%: the candidate filter is not cutting the shuffle")
  }

  test("bloom semi-join moves less than the unfiltered fact side") {
    // broadcast disabled so both paths must shuffle to join — on an
    // ISOLATED child session: suites share the JVM session concurrently,
    // so mutating the shared conf would race other suites' plans
    val sNB = spark.newSession()
    sNB.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(sNB, sf("sf0.01"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val urgent = Tables.orders(sNB, sf("sf0.01"))
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    // plain shuffled semi-join: the whole fact side crosses the wire
    val plain = shuffleWrite {
      li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .count()
    }
    val bloomed = shuffleWrite {
      operators.BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
        .count()
    }
    assert(plain > 0, "expected the plain semi-join to shuffle")
    // the sketch prunes ~21% of lineitem scan-side here (1-URGENT ≈ 1/5 of
    // orders); the contract is directional — the bloom path must move
    // LESS fact data than the unfiltered join, on top of identical output
    assert(bloomed < plain,
      s"bloom semi shuffled $bloomed B vs plain $plain B — " +
        "scan-side pre-filter is not reducing the exchange")
  }

  test("contamination audit shuffles matched pairs, not the corpus gram stream") {
    import spark.implicits._
    // decontamination regime: contamination is RARE — 2k train docs of
    // ~24 unique grams each, only 20 of them (1%) lead with an eval
    // doc's 10-token phrase (3 shared 8-grams per contaminated doc)
    val evalRows = (0 until 5).map(j =>
      (j.toLong, (1 to 10).map(i => s"s${j}_$i").mkString(" ")))
    val trainRows = (0 until 2000).map { id =>
      val base = (1 to 31).map(i => s"u${id}_$i").mkString(" ")
      val txt =
        if (id % 100 == 0) evalRows((id / 100) % 5)._2 + " " + base else base
      (1000L + id, txt)
    }
    val evalSet = evalRows.toDF("doc_id", "text")
    val train = trainRows.toDF("doc_id", "text")
    // corpus-gram-stream baseline: every train gram crosses the wire
    // (map-side combined, still gram-space-sized)
    val full = shuffleWrite {
      train.select(explode(array_distinct(
          operators.TextOps.ngrams(col("text"), 8))).as("gram"))
        .groupBy("gram").count()
        .write.format("noop").mode("overwrite").save()
    }
    val audited = shuffleWrite {
      operators.TextOps.contaminationPairs(train, evalSet, "doc_id", "text", 8)
        .write.format("noop").mode("overwrite").save()
    }
    assert(full > 0, "expected the gram-stream baseline to shuffle")
    // the broadcast eval side keeps the corpus out of every exchange:
    // only the ~20 matched (pair, gram) rows reach the aggregating
    // shuffle — orders of magnitude under the gram stream, 10x is the
    // conservative directional contract
    assert(audited * 10 < full,
      s"contamination audit shuffled $audited B vs gram stream $full B — " +
        "the corpus gram stream is reaching an exchange")
  }
}

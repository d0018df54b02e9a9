package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("selection count tracks total_weight/stride; heavy rows oversampled") {
    val df = (1L to 2000L).map(i => (i, if (i % 10 == 0) 900L else 100L))
      .toDF("id", "w")
    val stride = 1000L
    val got = Sampling.weightedSystematic(df, "id", "w", stride)
    val total = 1800L * 100L + 200L * 900L
    val n = got.count()
    // systematic sampling takes exactly one row per full stride of weight
    assert(math.abs(n - total / stride) <= 1, s"n=$n, expected ~${total / stride}")
    // heavy rows are 9x the weight of light rows → ~9x the selection rate
    val heavy = got.filter($"id" % 10 === 0).count().toDouble / 200L
    val light = got.filter($"id" % 10 =!= 0).count().toDouble / 1800L
    assert(heavy > 4 * light, s"heavy rate $heavy should dwarf light rate $light")
  }

  test("two-pass distributed cumsum equals the single-window formulation") {
    val df = (1L to 500L).map(i => (i, (i % 7) + 1L)).toDF("id", "w")
    val got = Sampling.weightedSystematic(df, "id", "w", stride = 50L)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // semantic spec: one global window over (md5, id) order
    val one = df
      .withColumn("h", md5($"id".cast("string")))
      .withColumn("cum", sum($"w").over(
        org.apache.spark.sql.expressions.Window.orderBy("h", "id")
          .rowsBetween(Long.MinValue, 0)))
      .filter(expr("cum DIV 50L") > expr("(cum - w) DIV 50L"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === one)
  }

  test("empty input yields empty sample, no crash") {
    val df = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Sampling.weightedSystematic(df, "id", "w", 100L).count() === 0)
  }

  test("mixtureEpochs: every group lands EXACTLY floor(n*num/den) replicas") {
    val df = (1L to 1000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val rates = Map("g0" -> (5L, 2L), "g1" -> (1L, 3L), "g2" -> (1L, 1L))
    val got = Sampling.mixtureEpochs(df, "id", "g", rates)
    val sizes = df.groupBy("g").count().as[(String, Long)].collect().toMap
    val out = got.groupBy("g").count().as[(String, Long)].collect().toMap
      .withDefaultValue(0L)
    for ((g, (num, den)) <- rates)
      assert(out(g) === sizes(g) * num / den,
        s"$g: quota ${sizes(g) * num / den}, got ${out(g)}")
    // per-row replica counts are floor/ceil of the rate, indexes 1..k
    val perRow = got.groupBy("id").agg(count(lit(1)).as("k"),
        max($"replica").as("mx"), min($"replica").as("mn"))
      .filter($"k" =!= $"mx" || $"mn" =!= 1L)
    assert(perRow.count() === 0, "replica must run 1..k")
    val g0 = got.filter($"g" === "g0").groupBy("id").count()
      .select(countDistinct("count")).as[Long].head()
    assert(g0 === 2L, "rate 5/2 must mix floor=2 and ceil=3 replica counts")
  }

  test("mixtureEpochs: partition-invariant; absent groups take defaultRate") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "known" else "other"))
      .toDF("id", "g")
    val rates = Map("known" -> (3L, 2L))
    val a = Sampling.mixtureEpochs(df.repartition(7), "id", "g", rates)
      .orderBy("id", "replica").collect().toSeq
    val b = Sampling.mixtureEpochs(df.coalesce(1), "id", "g", rates)
      .orderBy("id", "replica").collect().toSeq
    assert(a === b)
    // default (1,1): every 'other' row appears exactly once
    val others = a.filter(_.getString(1) == "other")
    assert(others.size === 200 && others.forall(_.getLong(2) == 1L))
  }

  test("mixtureEpochs: downsampling rate < 1 keeps the exact quota subset") {
    val df = (1L to 300L).map(i => (i, "d")).toDF("id", "g")
    val got = Sampling.mixtureEpochs(df, "id", "g", Map("d" -> (1L, 4L)))
      .collect()
    assert(got.length === 75)
    assert(got.forall(_.getLong(2) == 1L))
  }
}

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
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("bounded top-k aggregator matches the window formulation") {
    val o = graft.Tables.orders(spark, sf())
    val viaAgg = TopKAggregator.topKPerGroup(o, "o_custkey", "o_orderkey",
        "o_totalprice", k = 2)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank")
      .collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = o.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("o_custkey"), col("rank").cast("int"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rank")
      .collect()
    assert(viaAgg.length === viaWindow.length)
    viaAgg.zip(viaWindow).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(2) === b.getLong(2))
      assert(a.getDouble(3) === b.getDouble(3))
    }
  }
}

package graft.plans

import graft.SparkSpec

class MinHashSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("fused signature equals the reference k-min computation; deterministic") {
    val docs = Seq(
      (1L, Seq(11L, 42L, 77L, 42L)), // dup element: min unaffected
      (2L, Seq(5L)),
      (3L, Seq.empty[Long]))         // empty: all Long.MaxValue minima
      .toDF("id", "sh")
    val k = 8
    val got = docs.select(col("id"), MinHash.signatures(col("sh"), k).as("sig"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    // scala reference: per seed, min over elements of the same hash
    def ref(sh: Seq[Long]): Seq[Long] =
      (0 until k).map(s =>
        if (sh.isEmpty) Long.MaxValue
        else sh.map(h => MinHash.hashLong(h, s)).min)
    assert(got(0)._2 === ref(Seq(11L, 42L, 77L, 42L)))
    assert(got(1)._2 === ref(Seq(5L)))
    assert(got(2)._2 === ref(Seq.empty))
    assert(got.forall(_._2.length === k))
    // subset property: adding elements can only lower each minimum
    val subset = ref(Seq(11L, 42L))
    ref(Seq(11L, 42L, 77L)).zip(subset).foreach { case (full, sub) =>
      assert(full <= sub)
    }
  }
}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FloatVectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native dot matches the built-in HOF formulation") {
    val builtin = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(col("id"),
        FloatVectorExpressions.dot(col("a"), col("b")).as("native"),
        builtin.as("hof"))
      .orderBy("id").collect()
    rows.foreach(r => assert(r.getDouble(1) === r.getDouble(2)))
    assert(rows(0).getDouble(1) === 32.0)
  }

  test("native norm") {
    val r = df.select(col("id"), FloatVectorExpressions.norm(col("a")).as("n"))
      .orderBy("id").collect()
    assert(math.abs(r(0).getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(r(1).getDouble(1) === 0.0)
  }

  test("null inputs propagate null") {
    val withNull = Seq((1L, null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("id", "a", "b")
    val r = withNull.select(FloatVectorExpressions.dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL registration via GraftExtensions: all native kernels callable from SQL") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("vexpr_test")
    val r = spark.sql(
      "SELECT id, graft_dot(a, b) AS d, graft_norm(a) AS n FROM vexpr_test ORDER BY id")
      .collect()
    assert(r(0).getDouble(1) === 32.0)
    assert(math.abs(r(0).getDouble(2) - math.sqrt(14.0)) < 1e-12)
    val r2 = spark.sql(
      """SELECT graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i,
        |       size(graft_minhash(array(11L, 42L), 8)) AS k""".stripMargin)
      .collect().head
    assert(r2.getInt(0) === 2)
    assert(r2.getInt(1) === 8)
  }

  test("codegen survives: native kernels stay inside wholestage codegen") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val plan = emb.select(
        FloatVectorExpressions.dot(col("embedding"), col("embedding")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"))
    assert(!plan.contains("Found 0 WholeStageCodegen"))
  }
}

package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FlattenerSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def nestedDf = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("a", StructType(Seq(
        StructField("b", LongType),
        StructField("c", StructType(Seq(StructField("d", StringType)))))))))
    spark.createDataFrame(
      java.util.List.of(Row("r1", Row(1L, Row("x"))), Row("r2", Row(2L, null))),
      schema)
  }

  test("flatten produces __-separated leaf columns (ref {'a': {'b': 1}} -> a__b)") {
    val flat = Flattener.flatten(nestedDf)
    assert(flat.columns.toSeq === Seq("id", "a__b", "a__c__d"))
    val r = flat.orderBy("id").collect()
    assert(r(0).getLong(1) === 1L)
    assert(r(0).getString(2) === "x")
    assert(r(1).isNullAt(2)) // null struct -> null leaf == absent key
  }

  test("unflatten inverts flatten") {
    val back = Flattener.unflatten(Flattener.flatten(nestedDf))
    assert(back.schema === nestedDf.schema)
    assert(back.orderBy("id").collect().toSeq === nestedDf.orderBy("id").collect().toSeq)
  }

  test("flattenSchema mirrors flatten") {
    val fs = Flattener.flattenSchema(nestedDf.schema)
    assert(fs.fieldNames.toSeq === Seq("id", "a__b", "a__c__d"))
  }

  test("scalar+struct sibling (a with a__b, via add-only evolution) unflattens per row") {
    import spark.implicits._
    // row1 carries the scalar shape, row2 the object shape, row3 neither
    val df = Seq(
      ("r1", Some(1L), None: Option[Long]),
      ("r2", None: Option[Long], Some(2L)),
      ("r3", None: Option[Long], None: Option[Long]))
      .toDF("id", "a", "a__b")
    val back = Flattener.unflatten(df) // must not throw (was StringIndexOutOfBounds)
    assert(back.columns.toSeq === Seq("id", "a"))
    val json = back
      .select(col("id"), to_json(struct(back.columns.map(col): _*),
        Map("ignoreNullFields" -> "true")).as("j"))
      .orderBy("id").collect().map(_.getString(1))
    assert(json(0) === """{"id":"r1","a":1}""")
    assert(json(1) === """{"id":"r2","a":{"b":2}}""")
    assert(json(2) === """{"id":"r3"}""")

    // deeper level: x__a scalar beside x__a__b group
    val deep = Seq(("r1", Some(7L), None: Option[Long]), ("r2", None: Option[Long], Some(8L)))
      .toDF("id", "x__a", "x__a__b")
    val deepJson = Flattener.unflatten(deep)
      .select(to_json(struct(col("id"), col("x")),
        Map("ignoreNullFields" -> "true")).as("j"))
      .orderBy("j").collect().map(_.getString(0))
    assert(deepJson.toSet === Set(
      """{"id":"r1","x":{"a":7}}""", """{"id":"r2","x":{"a":{"b":8}}}"""))
  }
}

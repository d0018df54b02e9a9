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
}

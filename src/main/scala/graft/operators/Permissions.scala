package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-user-per-type permission gates (reference surface S24).
  *
  * The reference's v1 source ships no permission code, but its test suite
  * documents the contract (tests/test_views.py:16-21,79-118,373-440): users
  * carry an api_key; a permission row grants (read, create, write) per
  * (user, type); missing grant ⇒ 403. Re-expressed relationally: a
  * `permissions(user_id, type_id, can_read, can_create, can_write)` table
  * and a broadcast semi-join gate in front of any per-type read/write.
  */
object Permissions {

  val schema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("type_id", StringType, nullable = false),
    StructField("can_read", BooleanType),
    StructField("can_create", BooleanType),
    StructField("can_write", BooleanType)))

  def table(spark: SparkSession, rows: Seq[(String, String, Boolean, Boolean, Boolean)]): DataFrame = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      java.util.List.of(rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)): _*),
      schema)
  }

  /** True iff `user` holds `flag` on `typeId` (driver-side gate — the 403
    * decision point). */
  def isAllowed(perms: DataFrame, user: String, typeId: String,
                flag: String): Boolean =
    !perms.filter(col("user_id") === user && col("type_id") === typeId &&
      col(flag) === true).isEmpty

  /** Gate a serving read: rows survive only when the user can_read the
    * type. Broadcast semi-join — the permissions table is tiny metadata. */
  def gateRead(df: DataFrame, perms: DataFrame, user: String,
               typeId: String): DataFrame =
    df.join(
      broadcast(perms.filter(col("user_id") === user &&
        col("type_id") === typeId && col("can_read") === true)
        .select(col("type_id").as("__grant"))),
      expr("true"), "left_semi")
}

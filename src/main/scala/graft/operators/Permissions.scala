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

  /** Multi-tenant read gate: every (row, user) pair where the user holds
    * can_read on the row's type — the fan-out form serving uses to build
    * per-tenant views in one pass. One broadcast hash join against the
    * metadata-scale grant matrix; a user with no grant row for a type is
    * simply absent (the 403-on-missing contract), as is a can_read=false
    * row.
    *
    * The grant columns join under internal aliases (`__grant_*`) so an
    * input that already carries a `type_id` column can never collide with
    * the grant matrix's; `user_id` IS the output column this gate appends,
    * so that name is reserved on the input (checked, fails fast — ADVICE
    * r18 #1: an input user_id would otherwise survive ambiguously). */
  def gateReadsAll(df: DataFrame, typeCol: String,
                   perms: DataFrame): DataFrame = {
    require(!df.columns.contains("user_id"),
      "gateReadsAll appends user_id — the input must not already carry one")
    df.join(broadcast(perms.filter(col("can_read") === true)
        .select(col("user_id").as("__grant_user"),
          col("type_id").as("__grant_type"))),
      col(typeCol) === col("__grant_type"))
      .withColumn("user_id", col("__grant_user"))
      .drop("__grant_user", "__grant_type")
  }

  /** The declared demo grant matrix (q_permissions_gate) — ONE definition
    * shared by the Spark query and the DuckDB oracle's VALUES literal, so
    * the two sides can never diverge. Exercises all three outcomes: grant
    * (can_read=true), explicit deny (can_read=false), and missing row
    * (deny) — 'carol' holds exactly one grant, everything else about her
    * is absent. */
  val demoGrants: Seq[(String, String, Boolean, Boolean, Boolean)] = Seq(
    ("alice", "src0", true, true, true),
    ("alice", "src1", true, false, false),
    ("alice", "src2", false, false, false), // explicit deny
    ("alice", "src3", true, false, true),
    ("alice", "src4", true, true, false),
    ("bob", "src2", true, true, true),
    ("bob", "src3", false, true, true), // write-only: reads still deny
    ("bob", "src5", true, false, false),
    ("bob", "src7", true, false, false),
    ("carol", "src9", true, false, false))
}

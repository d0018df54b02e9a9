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

  /** Write-side 403 decision (tests/test_views.py:79-118) — ONE semantic
    * definition: writing rows of an EXISTING type requires can_write; a
    * type-creating FIRST write requires can_create. `grant` =
    * (can_create, can_write) for this (user, type), None = no grant row.
    * Returns the structured error code ([[graft.core.Validation
    * .quarantineRecords]]'s `error` field, the errors.py:20-25
    * error_code analog), None = allowed. The relational
    * [[classifyWrites]] mirrors this column-wise — PermissionsSpec sweeps
    * all combinations against both so they cannot drift one-sidedly. */
  def writeDecision(grant: Option[(Boolean, Boolean)],
                    typeExists: Boolean): Option[String] =
    if (typeExists && grant.exists(_._2)) None
    else if (!typeExists && grant.exists(_._1)) None
    else if (typeExists) Some("WriteForbidden")
    else Some("CreateForbidden")

  /** Relational write-gate classifier — [[writeDecision]] as columns, for
    * auditing a whole write batch in one pass: appends `error_code`
    * (NULL = allowed) to every (userCol, typeCol) write row. One broadcast
    * left join against the metadata-scale grant matrix (internal
    * `__grant_*` aliases — no input-column collisions); the existing-type
    * set is metadata (table-per-type) and rides as a literal IN. */
  def classifyWrites(writes: DataFrame, userCol: String, typeCol: String,
                     perms: DataFrame, existingTypes: Seq[String]): DataFrame = {
    require(!writes.columns.contains("error_code"),
      "classifyWrites appends error_code — the input must not already carry one")
    // duplicate (user, type) grant rows collapse by OR (any granting row
    // admits) BEFORE the join — r19 review: an un-collapsed duplicate
    // would row-multiply the writes here while the driver-side ingest
    // gate collapsed it nondeterministically; one deterministic rule,
    // shared with Ingest's fold (any-true), keeps the two paths equal
    val g = broadcast(perms
      .groupBy(col("user_id").as("__grant_user"),
        col("type_id").as("__grant_type"))
      .agg(max(coalesce(col("can_create"), lit(false))).as("__grant_create"),
        max(coalesce(col("can_write"), lit(false))).as("__grant_write")))
    writes.join(g, col(userCol) === col("__grant_user") &&
        col(typeCol) === col("__grant_type"), "left")
      .withColumn("__exists", col(typeCol).isin(existingTypes: _*))
      .withColumn("error_code",
        when(col("__exists") && coalesce(col("__grant_write"), lit(false)),
          lit(null).cast(StringType))
          .when(!col("__exists") && coalesce(col("__grant_create"), lit(false)),
            lit(null).cast(StringType))
          .when(col("__exists"), lit("WriteForbidden"))
          .otherwise(lit("CreateForbidden")))
      .drop("__grant_user", "__grant_type", "__grant_create", "__grant_write",
        "__exists")
  }

  /** The declared demo grant matrix (q_permissions_gate,
    * q_permissions_write_gate) — ONE definition shared by the Spark
    * queries and the DuckDB oracles' VALUES literals, so the two sides can
    * never diverge. Exercises all outcomes: grant (can_read=true),
    * explicit deny (can_read=false), and missing row (deny) — 'carol'
    * holds exactly one read grant; the last two rows are can_read=false
    * (invisible to the READ gate) and exist for the WRITE gate's
    * type-creating cases: bob may CREATE src11, carol holds can_write on
    * the not-yet-existing src12 — which does NOT admit its first write
    * (create requires can_create). */
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
    ("carol", "src9", true, false, false),
    ("bob", "src11", false, true, false), // new type: create admits
    ("carol", "src12", false, false, true)) // new type: write alone does NOT

  /** Existing-type set for the declared WRITE-gate key: src0..src9 were
    * created before the batch; src10+ writes are type-creating first
    * writes. One definition with the oracle's IN literal. */
  val demoExistingTypes: Seq[String] = (0 to 9).map(i => s"src$i")
}

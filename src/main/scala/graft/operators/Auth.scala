package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Engine

/** User / api-key auth model (reference surface S24's missing half: the
  * v1 source ships no auth code, but the test suite documents the contract
  * — an admin user bootstrapped with a generated api_key, Basic auth over
  * `(id, api_key)`, per-user `role` (admin bypasses grants), and password
  * on creation; reference tests/test_views.py:33-45,79-118,373-440).
  *
  * Users live in a regular engine table (`__users`) so creation and key
  * rotation ride the same LWW ingest path as any data — a rotated api_key
  * is just a newer row winning the serving view. Authentication reads are
  * driver-side metadata (the user table is tiny); authorization composes
  * [[Permissions]] for non-admin roles.
  */
object Auth {

  val UsersType = "__users"

  /** SHA-256 hex — passwords are never stored in the clear. */
  def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def envelope(spark: SparkSession, json: String): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(json)),
      StructType(Seq(StructField("message", StringType))))

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Create or overwrite a user (LWW upsert through the engine). Returns
    * the api_key in effect. */
  def upsertUser(h: Engine.Handle, id: String, role: String, password: String,
                 apiKey: Option[String] = None): String = {
    // the guards enforce SEMANTIC shape (identifier ids, known roles, hex
    // keys); structural JSON safety does NOT rest on them — the envelope is
    // emitted through a JSON writer, so a quote/backslash in any future
    // field is escaped data, never markup (no silent dead-letter, no
    // duplicate-key injection for Spark's last-wins parse to honor)
    require(id.matches("^[A-Za-z0-9_-]+$"), s"invalid user id: '$id'")
    require(role == "admin" || role == "user", s"invalid role: '$role'")
    apiKey.foreach(k => require(k.matches("^[A-Za-z0-9_-]+$"),
      s"invalid api key format"))
    val key = apiKey.getOrElse(
      java.util.UUID.randomUUID().toString.replace("-", ""))
    val root = jsonMapper.createObjectNode()
    root.put("type_id", UsersType)
    val data = root.putObject("data")
    data.put("id", id)
    data.put("role", role)
    data.put("api_key", key)
    data.put("password_hash", sha256(password))
    val report = h.ingest(envelope(h.spark, jsonMapper.writeValueAsString(root)))
    require(report.perType.getOrElse(UsersType, 0L) == 1L,
      s"user row for '$id' was not written (dead-lettered or quarantined)")
    key
  }

  /** Bootstrap the admin user if absent (reference: admin exists after app
    * bootstrap and authenticates with its generated api_key). Returns the
    * admin api_key (existing or newly generated). */
  def bootstrapAdmin(h: Engine.Handle): String =
    userRow(h, "admin") match {
      case Some(r) => r.getAs[String]("api_key")
      case None    => upsertUser(h, "admin", "admin", password = "")
    }

  private def userRow(h: Engine.Handle, id: String): Option[Row] =
    if (!h.registry.knownTypes.contains(UsersType)) None
    else h.table(UsersType).filter(col("id") === id).collect().headOption

  /** Basic-auth check: Some(role) when `(id, apiKey)` matches the serving
    * view of the user table, else None (401). */
  def authenticate(h: Engine.Handle, id: String, apiKey: String): Option[String] =
    userRow(h, id)
      .filter(_.getAs[String]("api_key") == apiKey)
      .map(_.getAs[String]("role"))

  /** Full authorization decision (the 401/403 gate): authenticate, then
    * admin bypasses grants and plain users need the (user, type, flag) row
    * in the permission matrix. */
  def authorize(h: Engine.Handle, perms: DataFrame, id: String, apiKey: String,
                typeId: String, flag: String): Boolean =
    authenticate(h, id, apiKey) match {
      case Some("admin") => true
      case Some(_)       => Permissions.isAllowed(perms, id, typeId, flag)
      case None          => false
    }
}

package graft.operators

import graft.SparkSpec
import graft.core.Engine

/** The reference test suite's auth contract (tests/test_views.py:33-45,
  * 79-118,373-440): admin bootstrap with generated api_key, Basic auth,
  * role bypass, per-(user, type, flag) grants, key rotation. */
class AuthSpec extends SparkSpec {

  private def freshEngine() = Engine.bootstrap(spark, tmpDir("graft-auth-wh"))

  test("admin bootstrap, authentication, and role bypass") {
    val h = freshEngine()
    val adminKey = Auth.bootstrapAdmin(h)
    assert(adminKey.nonEmpty)
    assert(Auth.bootstrapAdmin(h) === adminKey) // idempotent — same key back
    assert(Auth.authenticate(h, "admin", adminKey) === Some("admin"))
    assert(Auth.authenticate(h, "admin", "wrong-key") === None)
    assert(Auth.authenticate(h, "ghost", adminKey) === None)
    // admin needs no grant rows at all
    val noGrants = Permissions.table(spark, Seq.empty)
    assert(Auth.authorize(h, noGrants, "admin", adminKey, "my_type", "can_write"))
  }

  test("plain users go through the grant matrix; rotation invalidates old keys") {
    val h = freshEngine()
    Auth.bootstrapAdmin(h)
    val userKey = Auth.upsertUser(h, "my_user", "user", password = "my_secret")
    val perms = Permissions.table(spark,
      Seq(("my_user", "my_type", true, false, false))) // read-only grant
    assert(Auth.authorize(h, perms, "my_user", userKey, "my_type", "can_read"))
    assert(!Auth.authorize(h, perms, "my_user", userKey, "my_type", "can_write"))
    assert(!Auth.authorize(h, perms, "my_user", userKey, "other_type", "can_read"))
    assert(!Auth.authorize(h, perms, "my_user", "stolen-key", "my_type", "can_read"))
    // password is hashed at rest, never stored in the clear
    val row = h.table(Auth.UsersType)
      .filter(org.apache.spark.sql.functions.col("id") === "my_user")
      .collect().head
    assert(row.getAs[String]("password_hash") === Auth.sha256("my_secret"))
    assert(!row.toSeq.contains("my_secret"))
    // key rotation is an LWW overwrite: the new key wins, the old dies
    val rotated = Auth.upsertUser(h, "my_user", "user", password = "my_secret")
    assert(rotated !== userKey)
    assert(Auth.authenticate(h, "my_user", rotated) === Some("user"))
    assert(Auth.authenticate(h, "my_user", userKey) === None)
  }

  test("quote/backslash injection attempts in id or role are rejected outright") {
    val h = freshEngine()
    // a role carrying JSON markup can never reach the envelope: the shape
    // guard rejects it before any serialization happens (and the envelope
    // itself is built by a JSON writer, so even a guard regression would
    // yield escaped data, not a duplicate "role" key)
    for (bad <- Seq("""user","role":"admin""", "user\"", "user\\", "ad\"min"))
      intercept[IllegalArgumentException] {
        Auth.upsertUser(h, "my_user", bad, password = "pw")
      }
    for (badId <- Seq("""x","role":"admin""", "x\"y", "a\\b", "x\ny"))
      intercept[IllegalArgumentException] {
        Auth.upsertUser(h, badId, "user", password = "pw")
      }
    // passwords are unconstrained user input — markup in them must ride as
    // DATA through the writer and still authenticate end-to-end
    val key = Auth.upsertUser(h, "quoted_pw_user", "user",
      password = """p"w\{}:,"role":"admin"""")
    assert(Auth.authenticate(h, "quoted_pw_user", key) === Some("user"))
    val row = h.table(Auth.UsersType)
      .filter(org.apache.spark.sql.functions.col("id") === "quoted_pw_user")
      .collect().head
    assert(row.getAs[String]("role") === "user")
    assert(row.getAs[String]("password_hash") ===
      Auth.sha256("""p"w\{}:,"role":"admin""""))
  }
}

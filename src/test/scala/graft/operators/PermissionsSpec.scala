package graft.operators

import graft.SparkSpec

/** Permission matrix semantics from the reference's test suite
  * (tests/test_views.py:373-440): granted flags admit, missing rows deny. */
class PermissionsSpec extends SparkSpec {
  import spark.implicits._

  private def perms = Permissions.table(spark, Seq(
    ("alice", "t1", true, true, true),
    ("bob", "t1", true, false, false),
    ("bob", "t2", false, false, true)))

  test("flag checks follow the grant matrix; absent rows deny") {
    assert(Permissions.isAllowed(perms, "alice", "t1", "can_write"))
    assert(Permissions.isAllowed(perms, "bob", "t1", "can_read"))
    assert(!Permissions.isAllowed(perms, "bob", "t1", "can_write"))
    assert(Permissions.isAllowed(perms, "bob", "t2", "can_write"))
    assert(!Permissions.isAllowed(perms, "bob", "t2", "can_read"))
    assert(!Permissions.isAllowed(perms, "carol", "t1", "can_read")) // no row
  }

  test("gateRead admits all rows for granted users and none otherwise") {
    val data = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    assert(Permissions.gateRead(data, perms, "alice", "t1").count() === 2)
    assert(Permissions.gateRead(data, perms, "bob", "t2").count() === 0)
    assert(Permissions.gateRead(data, perms, "carol", "t1").count() === 0)
  }

  test("gateReadsAll fans out rows to exactly the can_read grant holders") {
    val data = Seq((1L, "t1"), (2L, "t2"), (3L, "t9")).toDF("id", "typ")
    val got = Permissions.gateReadsAll(data, "typ", perms)
      .select("id", "user_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // t1 readable by alice+bob, t2 denied for bob (can_read=false) and
    // ungranted for alice, t9 has no rows at all
    assert(got === Set((1L, "alice"), (1L, "bob")))
  }

  test("gateReadsAll: input type_id column cannot collide; user_id is reserved (ADVICE r18 #1)") {
    // an input that already carries type_id used to produce an ambiguous
    // join (the grant matrix's own type_id); the internal __grant_ aliases
    // make it unambiguous — the input's column survives untouched
    val data = Seq((1L, "t1", "t2")).toDF("id", "typ", "type_id")
    val got = Permissions.gateReadsAll(data, "typ", perms)
      .select("id", "type_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "t2", "alice"), (1L, "t2", "bob")))
    // user_id IS the appended output column — a pre-existing one would be
    // silently overwritten, so the gate fails fast instead
    val bad = Seq((1L, "t1", "mallory")).toDF("id", "typ", "user_id")
    val ex = intercept[IllegalArgumentException](
      Permissions.gateReadsAll(bad, "typ", perms))
    assert(ex.getMessage.contains("user_id"))
  }

  test("classifyWrites == writeDecision on every (grant, exists) combination") {
    // the relational classifier and the driver-side ingest gate share ONE
    // semantic definition; this sweep makes a one-sided edit impossible:
    // grant ∈ {absent} ∪ {(create, write) : 4 combos}, type ∈ {exists, new}
    val grantCombos: Seq[Option[(Boolean, Boolean)]] =
      None +: (for (c <- Seq(false, true); w <- Seq(false, true))
        yield Some((c, w)))
    val cases = for {
      (g, gi) <- grantCombos.zipWithIndex
      exists <- Seq(true, false)
    } yield (s"u$gi", if (exists) "t_old" else "t_new", g, exists)
    val permRows = cases.collect { case (u, t, Some((c, w)), _) =>
      (u, t, false, c, w) }.distinct
    val writes = cases.map { case (u, t, _, _) => (u, t) }
      .toDF("user_id", "type_id")
    val got = Permissions.classifyWrites(writes, "user_id", "type_id",
        Permissions.table(spark, permRows), Seq("t_old"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[String]("error_code"))).toMap
    cases.foreach { case (u, t, g, exists) =>
      assert(got((u, t)) === Permissions.writeDecision(g, exists),
        s"classifier diverged from writeDecision at grant=$g exists=$exists")
    }
    // duplicate (user, type) grant rows collapse by OR deterministically
    // on BOTH paths (r19 review: .toMap was partition-order last-wins):
    // a deny row + a grant row for the same pair must ADMIT, always,
    // and must not row-multiply the classifier's output
    val dupPerms = Permissions.table(spark, Seq(
      ("u", "t_old", false, false, false),
      ("u", "t_old", false, false, true)))
    val dupGot = Permissions.classifyWrites(
        Seq(("u", "t_old")).toDF("user_id", "type_id"),
        "user_id", "type_id", dupPerms, Seq("t_old"))
      .collect()
    assert(dupGot.length === 1, "duplicate grants must not row-multiply")
    assert(dupGot.head.getAs[String]("error_code") == null,
      "any granting duplicate row admits")

    // spot-pin the matrix corners (the reference 403 contract)
    assert(Permissions.writeDecision(None, typeExists = true) === Some("WriteForbidden"))
    assert(Permissions.writeDecision(None, typeExists = false) === Some("CreateForbidden"))
    assert(Permissions.writeDecision(Some((true, false)), typeExists = false) === None)
    assert(Permissions.writeDecision(Some((false, true)), typeExists = false) === Some("CreateForbidden"))
    assert(Permissions.writeDecision(Some((false, true)), typeExists = true) === None)
    assert(Permissions.writeDecision(Some((true, false)), typeExists = true) === Some("WriteForbidden"))
  }
}

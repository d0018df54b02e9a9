package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Cross-instance refresh semantics of [[SchemaRegistry]] — in particular
  * the ADVICE-r11 medium: another instance's writeDescriptor swap leaves a
  * WINDOW where the descriptors dir is renamed aside; a refresh landing in
  * that window must never read the absence as "empty registry" and prune
  * the cache (a concurrent getOrCreate could then re-persist a live type
  * with an empty meta-only schema, permanently dropping evolved columns). */
class RegistryRefreshSpec extends SparkSpec {

  private def fieldNames(s: StructType): Set[String] = s.fields.map(_.name).toSet

  test("second instance on the same path sees another instance's evolve after refresh") {
    val wh = tmpDir("graft-reg-refresh")
    val a = new SchemaRegistry(spark, wh); a.bootstrap()
    val b = new SchemaRegistry(spark, wh); b.bootstrap()
    a.getOrCreate("t")
    a.evolve("t", StructType(Seq(StructField("x", LongType))))
    // B hasn't seen "t"; its refresh must pick it up (mtime-driven)
    b.refreshIfStale()
    assert(b.get("t").isDefined && fieldNames(b.get("t").get).contains("x"))
    // and a type A drops is pruned from B after a SUCCESSFUL read
    a.drop("t")
    b.refreshIfStale()
    assert(b.get("t").isEmpty, "prune after a successful read of a present store")
  }

  test("swap window: a missing descriptors dir never prunes; heal-retry recovers") {
    val wh = tmpDir("graft-reg-window")
    val a = new SchemaRegistry(spark, wh); a.bootstrap()
    a.getOrCreate("t")
    a.evolve("t", StructType(Seq(StructField("evolved_col", StringType))))
    assert(fieldNames(a.get("t").get).contains("evolved_col"))
    // simulate ANOTHER instance mid-swap: descriptors renamed aside —
    // exactly the state between writeDescriptor's rename-aside and
    // rename-in (only `.old` holds the store)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val desc = new org.apache.hadoop.fs.Path(wh + "/descriptors")
    val aside = new org.apache.hadoop.fs.Path(wh + "/descriptors.old")
    assert(fs.rename(desc, aside), "test setup: rename aside")
    // the refresh lands in the window: it must KEEP the cache (the
    // heal-retry may restore the store, which is also acceptable — the
    // contract is that 'evolved_col' survives either way)
    a.refreshIfStale()
    assert(a.get("t").isDefined && fieldNames(a.get("t").get).contains("evolved_col"),
      "refresh during the swap window must not prune live types")
    // a getOrCreate racing the window must serve the cached evolved
    // schema, NOT re-create an empty meta-only descriptor
    val got = a.getOrCreate("t")
    assert(fieldNames(got).contains("evolved_col"),
      "getOrCreate during the window must serve the evolved schema")
    // after the window closes (healed by refresh or restored here), the
    // store still holds the evolved descriptor for a FRESH instance
    if (!fs.exists(desc)) assert(fs.rename(aside, desc))
    val c = new SchemaRegistry(spark, wh); c.bootstrap()
    assert(fieldNames(c.get("t").get).contains("evolved_col"),
      "no write in the window may have dropped evolved columns on disk")
  }

  test("writeDescriptor heals a crashed swap instead of wiping other types") {
    val wh = tmpDir("graft-reg-crash")
    val a = new SchemaRegistry(spark, wh); a.bootstrap()
    a.getOrCreate("t1")
    a.evolve("t1", StructType(Seq(StructField("x", LongType))))
    // crashed swap: only `.old` survives
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(wh + "/descriptors"),
      new org.apache.hadoop.fs.Path(wh + "/descriptors.old")))
    // the next write (a new type) must heal first, then merge — t1 intact
    a.getOrCreate("t2")
    val c = new SchemaRegistry(spark, wh); c.bootstrap()
    assert(c.get("t1").isDefined && fieldNames(c.get("t1").get).contains("x"),
      "healed write must preserve previously persisted types")
    assert(c.get("t2").isDefined)
  }
}

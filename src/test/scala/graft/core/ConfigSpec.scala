package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Env-override layering (reference config.py:7-45 semantics). */
class ConfigSpec extends AnyFunSuite {
  test("defaults load with empty env") {
    val c = Config.load(Map.empty)
    assert(c === Config.default)
  }

  test("a.b path overrides via A_B env var") {
    assert(Config.envKey("kafka.consumer_group") === "KAFKA_CONSUMER_GROUP")
    val c = Config.load(Map(
      "GRAFT_WAREHOUSE_DIR" -> "/data/wh",
      "GRAFT_IMMUTABLE_SCHEMA" -> "true",
      "KAFKA_TOPICS" -> "a, b,c",
      "SPARK_SHUFFLE_PARTITIONS" -> "128"))
    assert(c.warehouseDir === "/data/wh")
    assert(c.immutableSchema)
    assert(c.kafkaTopics === Seq("a", "b", "c"))
    assert(c.shufflePartitions === 128)
    assert(c.kafkaCluster === Config.default.kafkaCluster) // untouched default
  }
}

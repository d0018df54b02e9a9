package graft.core

/** Layered engine configuration: defaults ← environment overrides.
  *
  * Reference: moisturizer/config.py:7-45 — a nested default dict where any
  * leaf `a.b` can be overridden by env var `A_B`. (The reference's
  * docker-compose uses a `MOISTURIZER_` prefix that its own loader never
  * strips — config.py:30-32 drift bug; NOT replicated, per SURVEY §7.6.)
  */
final case class Config(
    warehouseDir: String,
    overrideWarehouse: Boolean,
    immutableSchema: Boolean,
    kafkaCluster: String,
    kafkaTopics: Seq[String],
    kafkaGroup: String,
    shufflePartitions: Int)

object Config {
  /** Defaults mirroring the reference's shape (config.py:8-17). */
  val default: Config = Config(
    warehouseDir = "/tmp/graft-warehouse",
    overrideWarehouse = false,
    immutableSchema = false,
    kafkaCluster = "localhost:9092",
    kafkaTopics = Seq("graft"),
    kafkaGroup = "graft",
    shufflePartitions = 32)

  /** `a.b` → `A_B` (reference get_config_environ, config.py:26-35). */
  def envKey(path: String): String = path.replace('.', '_').toUpperCase

  def load(env: Map[String, String] = sys.env): Config = {
    def s(path: String, dflt: String): String = env.getOrElse(envKey(path), dflt)
    def b(path: String, dflt: Boolean): Boolean =
      env.get(envKey(path)).map(_.toBoolean).getOrElse(dflt)
    def i(path: String, dflt: Int): Int =
      env.get(envKey(path)).map(_.toInt).getOrElse(dflt)
    Config(
      warehouseDir = s("graft.warehouse_dir", default.warehouseDir),
      overrideWarehouse = b("graft.override_warehouse", default.overrideWarehouse),
      immutableSchema = b("graft.immutable_schema", default.immutableSchema),
      kafkaCluster = s("kafka.cluster", default.kafkaCluster),
      kafkaTopics = s("kafka.topics", default.kafkaTopics.mkString(","))
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty),
      kafkaGroup = s("kafka.consumer_group", default.kafkaGroup),
      shufflePartitions = i("spark.shuffle_partitions", default.shufflePartitions))
  }
}

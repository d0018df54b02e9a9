package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the per-micro-batch append fixed cost: times a
  * 16-bucket dynamic-partition parquet append of a micro-batch-sized frame
  * under candidate writer configurations. Diagnostic only.
  * Usage: sbt "runMain graft.tools.WriteProbe"
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // micro-batch-shaped frame: ~8k rows, a dozen columns, 16 buckets
    val df = spark.range(8000)
      .withColumn("_part", pmod(xxhash64(col("id")), lit(16)))
      .withColumn("s1", concat(lit("user_"), col("id")))
      .withColumn("s2", sha2(col("s1"), 256))
      .withColumn("d1", col("id") * 1.5)
      .withColumn("ts", current_timestamp())
      .cache()
    df.count()

    val base = java.nio.file.Files.createTempDirectory("writeprobe").toString
    def time(tag: String)(f: String => Unit): Unit = {
      val times = (1 to 6).map { i =>
        val dir = s"$base/$tag-$i"
        val t0 = System.nanoTime()
        f(dir)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $tag%-28s min=${times.head}%.3f med=${times(times.size / 2)}%.3f")
    }

    time("coalesce1-default") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part").parquet(dir)
    }
    time("coalesce1-noflush") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("parquet.block.size", 1024 * 1024)
        .option("parquet.page.size", 64 * 1024)
        .parquet(dir)
    }
    time("coalesce1-nosuccess") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(dir)
    }
    time("coalesce1-v2commit") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(dir)
    }
    time("coalesce1-all") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("parquet.block.size", 1024 * 1024)
        .option("parquet.page.size", 64 * 1024)
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(dir)
    }
    time("bucketed16-default") { dir =>
      df.repartition(16, col("_part")).write.mode("append").partitionBy("_part").parquet(dir)
    }
    time("singlefile-nopartition") { dir =>
      df.coalesce(1).write.mode("append").parquet(dir)
    }
    // RawLocalFileSystem: no .crc shadow files (HDFS checksums natively;
    // the shadow files are a LocalFileSystem artifact)
    val rawConf = spark.sparkContext.hadoopConfiguration
    time("coalesce1-rawfs") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .parquet(dir)
    }
    time("coalesce1-raw+noflush+nos") { dir =>
      df.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part")
        .option("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .option("parquet.block.size", 1024 * 1024)
        .option("parquet.page.size", 64 * 1024)
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(dir)
    }
    // one single-bucket frame: is the cost per FILE or per WRITE?
    val one = df.withColumn("_part", lit(0L)).cache(); one.count()
    time("coalesce1-onebucket") { dir =>
      one.coalesce(1).sortWithinPartitions("_part")
        .write.mode("append").partitionBy("_part").parquet(dir)
    }
    spark.stop()
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the driver's local[32] harness but the same
  * settings are what we'd ship on a real cluster: AQE on (runtime skew-join
  * and partition coalescing), shuffle partitions sized to the parallelism at
  * hand (32 locally; on a 1000-executor cluster this would be set to
  * 2-3x total cores by the submitter), UTC session time, and a modest
  * broadcast threshold so dimension tables (region/nation/supplier/config)
  * broadcast instead of shuffling.
  */
object Sessions {
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // Streaming state lives in RocksDB, not on the executor heap: the
      // default HDFS-backed provider holds every state key in JVM memory —
      // an OOM cliff once sessionization/dedup state reaches 100M+ keys.
      // RocksDB spills to executor-local disk and changelog checkpointing
      // ships per-batch deltas instead of full snapshots. Proven equivalent
      // on the kill-and-restart spec (StreamingSpec, both providers).
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
